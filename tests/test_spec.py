import numpy as np

from semantic_search_system_spark import spec


def test_clean_tokens_matches_sql_semantics():
    assert spec.clean_tokens("Hello, World! x2") == ["hello", "world", "x2"]
    assert spec.clean_tokens("  a   b  ") == ["a", "b"]
    assert spec.clean_tokens("") == []


def test_top_k_deterministic_tiebreak():
    items = ["b", "a", "c", "a", "b"]
    # a and b tie at 2 → lexicographic; c has 1
    assert spec.top_k_by_freq(items, 2) == [("a", 2), ("b", 2)]


def test_extract_doc_caps_and_filters():
    content = "the spark table spark join the table spark"
    out = spec.extract_doc(content)
    assert out["entities"][0] == "spark"  # freq 3
    assert "the" not in out["entities"]
    assert len(out["entities"]) <= spec.TOP_K_ENTITIES
    assert len(out["topics"]) <= spec.TOP_K_TOPICS
    # bigram 'spark table' occurs twice? positions: the spark / spark table / ...
    assert all(" " in t for t in out["topics"])


def test_embed_unit_norm_and_determinism():
    v1 = spec.embed_text("spark join table")
    v2 = spec.embed_text("spark join table")
    assert v1.shape == (spec.EMBED_DIM,)
    assert np.array_equal(v1, v2)
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-6
    assert spec.embed_text("").sum() == 0.0


def test_media_ref_is_md5():
    r = spec.media_ref("7", 3)
    assert r.startswith("media://") and len(r) == len("media://") + 32
