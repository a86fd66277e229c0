from .interleave import build_interleaved, interleaved_path, spans_for_text  # noqa: F401
