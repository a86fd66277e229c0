"""The single shared specification for deterministic corpus synthesis, extraction,
and embedding.

Everything the correctness gate depends on lives here so the golden-fixture
generator (plain pandas, ``fixtures/golden.py``) and the Spark pipeline
(Arrow-vectorized UDFs, ``operators/*``) implement EXACTLY the same function —
that is how the triple P/R >= 0.95 target (BASELINE.json.north_rule) is made
reachable and then perturb-tested (SURVEY.md §7.3).

Reference semantics reproduced (file:line refs into /root/reference):
- entity = top-5 tokens by frequency   (nlp/pr_local_nlp_pipeline.py:70-93)
- topic  = top-5 key phrases            (nlp/pr_aws_nlp.py:74-76; we use bigrams)
- summary = lead sentences              (nlp/pr_aws_nlp.py:21)
- embedding = 256-d L2-normalized       (utils/bedrock.py:35-49, create_vector_index.py:15)
- normalize_key = strip + lower         (knowledge_graph/knowledge_graph.py:51-55)
"""

from __future__ import annotations

import hashlib
import re as _re

import numpy as np

# Version of the deterministic spec — bump when any constant/function here
# changes so cached pipeline outputs (data/out/v<N>/...) are invalidated.
SPEC_VERSION = 1

# ---------------------------------------------------------------- corpus synthesis
# Interleaved-span generation over /root/testdata/sf*/documents.parquet
# (BASELINE.json.input_hint: doc_id:string,
#  spans:array<struct<kind:string,text:string,media_ref:string,offset:int32>>).
WORDS_PER_SPAN = 8          # text span = 8 consecutive source tokens
TEXT_SPANS_PER_MEDIA = 3    # after every 3rd text span, insert one media span
MEDIA_KINDS = ("image", "video", "audio")  # cycle by media ordinal
HOT_DOC_MOD = 10            # doc_id % 10 == 0 → skewed doc (hot entity)
HOT_TOKENS = "hotterm hotterm hotterm hotterm connecticut hotterm hotterm hotterm"

# ---------------------------------------------------------------- extraction
TOP_K_ENTITIES = 5
TOP_K_TOPICS = 5
SUMMARY_SPANS = 2
STOPWORDS = frozenset(
    {"a", "the", "and", "of", "to", "in", "is", "it", "for", "on", "with", "at", "by"}
)
PRED_MENTIONS = "MENTIONS"
PRED_HAS_TOPIC = "HAS_TOPIC"
PRED_RELATES = "RELATES_TO_DOC"

# ---------------------------------------------------------------- embedding
EMBED_DIM = 256             # utils/bedrock.py:41 — Titan 256-d, L2-normalized
# ---------------------------------------------------------------- canonicalization
PHRASE_SIM_THRESHOLD = 0.60  # cosine cut for phrase-cluster edges (topic_modeling.py:31-36)
SIM_NDIGITS = 6              # every engine rounds cosines to 6dp BEFORE thresholding

# ---------------------------------------------------------------- doc-IVF serving
# Cross-engine constants of the ANN serving path (plans/search.py builds the
# index, the DuckDB oracle replays it; both derive the SAME values from the
# SAME manifest count — see plans/search.doc_ivf_params). They live here, with
# the other cross-engine fixpoints, as the single source of truth.
DOC_IVF_MIN_CENTROIDS = 8    # floor so small test corpora still multi-bucket
DOC_IVF_MIN_PROBE = 3
DOC_IVF_PROBE_FRAC = (3, 8)  # probe ceil(3/8 · n_centroids) — recall contract
# Signal-adaptive escalation: when round(max centroid·query cosine, 6) is
# below this, the centroid ranking carries NO information for the query (the
# query is near-orthogonal to every centroid — measured on the panel: such a
# query's recall at the contract fraction collapses to ~0.44 because its true
# neighbors spread uniformly over buckets) and the probe escalates to ALL
# buckets: exact recall at exact-scan cost, instead of a silent recall
# cliff. Cumulative-mass probing (probe until Σ qsim ≥ τ) was measured WORSE
# here: a degenerate query concentrates its tiny positive mass in 1 centroid,
# so the mass rule selects 1 probe exactly when it should select many.
# In-distribution queries sit far above this threshold (0.16-0.43 on the
# panel vs 0.0 for the degenerate query), so the escalation never fires on
# the hot path; real embedding models separate the two regimes even further.
DOC_IVF_SIGNAL_MIN = 0.1
# Escalation COST bound (round-6 VERDICT #3): an escalated query probes
# min(n_centroids, DOC_IVF_ESCALATE_FACTOR × n_probe) buckets, not
# unconditionally all of them — at the contract probe fraction (3/8) the
# tier saturates to the full scan (4 × 3/8 ≥ 1), so behavior and recall are
# UNCHANGED at every corpus size under the shipped parameters, but a
# deployment running a leaner probe fraction (say 1/16 at 10^6 centroids)
# has its worst-case out-of-distribution query bounded at 4× the contract
# cost instead of a full corpus scan. Escalations are counted
# (operators/similarity.probe_stats) so a burst is observable.
DOC_IVF_ESCALATE_FACTOR = 4
# Frozen-centroid APPEND path (round-6 VERDICT #4): appended epochs beyond
# this fraction of the indexed base corpus trigger a full refit (delete +
# rebuild) instead of another frozen-centroid assignment — past that much
# drift the fit sample no longer represents the corpus and the recall
# contract can quietly erode.
DOC_IVF_DRIFT_REFIT_FRAC = 0.5


def round_half_away(x, ndigits: int = SIM_NDIGITS):
    """Round half AWAY from zero, matching Spark F.round and DuckDB round()
    exactly — np.round is half-to-even, which can diverge from the SQL oracles
    on exact .5 boundaries. The spec's edge predicate is
    ``round_half_away(cosine, 6) >= PHRASE_SIM_THRESHOLD`` in EVERY engine:
    unrounded comparisons let different float summation orders (numpy pairwise
    matmul vs a sequential SQL/aggregate fold) flip pairs sitting exactly at
    the threshold (round-3 ADVICE #2)."""
    scale = 10.0**ndigits
    return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)


def media_ref(doc_id: str, offset: int) -> str:
    """Deterministic media reference: md5 so Spark SQL / DuckDB can reproduce it."""
    return "media://" + hashlib.md5(f"{doc_id}:{offset}".encode()).hexdigest()


# ---------------------------------------------------------------- canonical whitespace
# The spec's whitespace is Java's ``\s`` — [ \t\n\x0b\f\r] — written as an
# EXPLICIT class because the four regex engines in play disagree on the
# shorthand: Java \s includes \x0b, RE2 (Arrow / DuckDB) excludes it, and
# Python re \s additionally matches unicode whitespace. One literal class,
# interpreted identically by all four, keeps the fused Arrow hot path
# output-identical to the standalone JVM operators and the DuckDB oracle
# (round-3 ADVICE #1). \t \n \x0b \f \r escapes parse the same everywhere.
CLEAN_STRIP_RE = r"[^a-z0-9 \t\n\x0b\f\r]"  # chars to delete after lower()
CLEAN_WS_RE = r"[ \t\n\x0b\f\r]+"           # runs to collapse to one space


def clean_tokens(text: str) -> list[str]:
    """Noise removal + lowercase + whitespace split (clean_text, pr_meta_store.py:26-29).

    Exactly ``regexp_replace(lower(x), CLEAN_STRIP_RE, '')`` then split —
    byte-for-byte the Spark/DuckDB expression, so every engine tokenizes
    identically. str.split() with no argument splits on every CLEAN_WS_RE
    char (the strip stage already removed all other separators).
    """
    return _re.sub(CLEAN_STRIP_RE, "", text.lower()).split()


def top_k_by_freq(items: list[str], k: int) -> list[tuple[str, int]]:
    """Counter.most_common(k) with a DETERMINISTIC tie-break: count desc, item asc.

    (The reference's Counter.most_common is insertion-ordered on ties —
    pr_local_nlp_pipeline.py:70-93 — which is not reproducible across engines;
    we fix lexicographic order so Spark, pandas and DuckDB agree.)
    """
    counts: dict[str, int] = {}
    for it in items:
        counts[it] = counts.get(it, 0) + 1
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def extract_doc(content: str) -> dict:
    """The extraction spec over one document's concatenated text spans.

    Returns entities (top-5 non-stopword tokens), topics (top-5 non-stopword
    adjacent bigrams), both with the deterministic tie-break of
    ``top_k_by_freq``.
    """
    toks = [t for t in clean_tokens(content) if t not in STOPWORDS]
    raw = clean_tokens(content)
    bigrams = [
        f"{raw[i]} {raw[i + 1]}"
        for i in range(len(raw) - 1)
        if raw[i] not in STOPWORDS and raw[i + 1] not in STOPWORDS
    ]
    return {
        "entities": [t for t, _ in top_k_by_freq(toks, TOP_K_ENTITIES)],
        "topics": [b for b, _ in top_k_by_freq(bigrams, TOP_K_TOPICS)],
    }


def summarize(text_spans: list[str]) -> str:
    """Lead-k summary (pr_aws_nlp.py:21 '2-3 line summary' made deterministic)."""
    return " ".join(text_spans[:SUMMARY_SPANS])


def embed_token_slot(token: str) -> tuple[int, float]:
    """Feature-hash slot + sign for one token (deterministic, md5-based)."""
    h = hashlib.md5(token.encode()).hexdigest()
    idx = int(h[:8], 16) % EMBED_DIM
    sign = 1.0 if int(h[8], 16) % 2 == 0 else -1.0
    return idx, sign


def embed_text(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic 256-d hashed embedding, L2-normalized (stands in for Titan;
    same signature/contract as utils/bedrock.py:35-49: float vector, unit norm)."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in clean_tokens(text):
        idx, sign = embed_token_slot(tok)
        vec[idx] += sign
    n = np.linalg.norm(vec)
    if n > 0:
        vec /= n
    return vec.astype(np.float32)


def normalize_key(s: str) -> str:
    """knowledge_graph/knowledge_graph.py:51-55 — join-key normalization."""
    return s.strip().lower()
