"""Multimodal column plumbing: media spans as opaque binary/ref columns with
typed metadata, decoded/feature-extracted through ``mapInPandas``.

The interleaved corpus carries media spans (kind image/video/audio +
``media_ref``). At scale, the actual bytes live in object storage addressed by
``media_ref``; this module implements the REAL Spark-side plumbing — schema,
partition-preserving batch iteration, Arrow batch shapes, frame-sampling
explode — with the codec layer STUBBED: the container has no image/audio
libraries, so ``decode_media`` either raises ``NotImplementedError`` (real
mode) or produces a deterministic md5-derived fake payload (test mode). The
fake is clearly marked and keeps every downstream op (feature vectors,
similarity, grouping) fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 32
MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, kind string, "
    "frame int, features array<float>, decode_ok boolean"
)

# Pluggable decoder registry: a codec-bearing environment activates real
# decoding WITHOUT code changes here — register a top-level (picklable)
# ``media_ref -> bytes`` callable per kind ('image'/'audio'/'video', or '*' as
# the catch-all) at import time. ``extract_media_features`` snapshots the
# registry into the mapInPandas closure, so registrations made on the driver
# before the plan is built reach the executor Python workers (module globals
# alone would not — workers import this module fresh).
_DECODERS: dict[str, Callable[[str], bytes]] = {}


def register_decoder(kind: str, fn: Callable[[str], bytes]) -> None:
    _DECODERS[kind] = fn


def unregister_decoder(kind: str) -> None:
    _DECODERS.pop(kind, None)


def decode_media(
    media_ref: str,
    kind: str,
    fake: bool = True,
    decoders: dict[str, Callable[[str], bytes]] | None = None,
) -> bytes:
    """Codec boundary. A registered decoder (see ``register_decoder``) wins;
    otherwise this is a STUB — the container has no image/audio libraries —
    that raises in real mode or emits a deterministic fake payload in test
    mode."""
    reg = _DECODERS if decoders is None else decoders
    dec = reg.get(kind) or reg.get("*")
    if dec is not None:
        return dec(media_ref)
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this environment; "
            "register_decoder() a real codec, or run with fake=True for the "
            "deterministic test payload"
        )
    # deterministic fake: 64 bytes derived from the ref — stable across runs
    h = hashlib.md5(media_ref.encode()).digest()
    return (h * 4)[:64]


def _fake_features(payload: bytes, frame: int, dim: int = FEATURE_DIM) -> np.ndarray:
    # deterministic 'feature extraction' over the fake payload
    h = hashlib.md5(payload + frame.to_bytes(4, "little")).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    vec = (raw % 1000).astype(np.float64) / 1000.0
    n = np.linalg.norm(vec)
    return (vec / n if n else vec).astype(np.float32)


def _frames_for(kind: str) -> int:
    # video gets 3 sampled frames; image/audio one
    return 3 if kind == "video" else 1


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media(doc_id, media_ref, kind) → one row per (media item, frame) with a
    unit-norm feature vector. The decode/extract runs per Arrow batch inside
    ``mapInPandas`` — the scalable shape for codec work (CPU-bound, no shuffle;
    partition count controls parallelism)."""
    decoders = dict(_DECODERS)  # snapshot into the closure → reaches workers

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {
                "doc_id": [], "media_ref": [], "kind": [],
                "frame": [], "features": [], "decode_ok": [],
            }
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                try:
                    payload = decode_media(ref, kind, fake=fake, decoders=decoders)
                    ok = True
                except NotImplementedError:
                    payload, ok = b"", False
                for frame in range(_frames_for(kind)):
                    rows["doc_id"].append(doc_id)
                    rows["media_ref"].append(ref)
                    rows["kind"].append(kind)
                    rows["frame"].append(frame)
                    rows["features"].append(
                        _fake_features(payload, frame) if ok else None
                    )
                    rows["decode_ok"].append(ok)
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=MEDIA_FEATURES_SCHEMA)


def failed_media_rows(features: DataFrame) -> DataFrame:
    """decode_ok=false feature rows → quarantine-table shape (doc_id, stage,
    reason); commit through the Catalog as ``failed_rows`` so the resume sweep
    can retry/report them (pr_aws_nlp.py:296-310 failure-list analog)."""
    return (
        features.where(~F.col("decode_ok"))
        .select(
            "doc_id",
            F.lit("media_decode").alias("stage"),
            F.concat(F.lit("decode_failed:"), F.col("media_ref")).alias("reason"),
        )
        .distinct()
    )


def media_spans(interleaved: DataFrame) -> DataFrame:
    """Project the media spans out of the interleaved table (typed metadata)."""
    s = interleaved.select("doc_id", F.explode("spans").alias("s")).where(
        F.col("s.kind") != "text"
    )
    return s.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("kind"),
        F.col("s.offset").alias("offset"),
    )
