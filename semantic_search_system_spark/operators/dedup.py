"""Deduplication family for large-scale training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design: every method is shuffle-bounded by CANDIDATE GENERATION —
all-pairs comparison is never materialized. Exact dedup is one hash groupBy;
MinHash/SimHash bucket by band keys so only same-bucket pairs are compared;
Jaccard and cosine near-dup join on blocking keys. AQE skew-join handles hot
buckets (a degenerate band key — e.g. all-empty docs — is the classic skew).

Engine-agnostic hashing: MinHash permutations use md5 (hex strings compare in
the same order as their numeric value, so ``min`` over hex strings IS the
minhash) — this keeps the operator reproducible in the DuckDB oracle, unlike
xxhash64. SimHash uses a vectorized pandas UDF (bit math over md5 digests).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import clean_text_col

# ------------------------------------------------------------------ shingles
def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc as array<string> (native HOFs)."""
    toks = F.split(clean_text_col(F.col(text_col)), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return df.withColumn("shingles", shingles)


# ------------------------------------------------------------------ MinHash + LSH
def with_minhash(df: DataFrame, n_perm: int = 16) -> DataFrame:
    """MinHash signature via md5-keyed 'permutations', all native expressions:
    sig[i] = min over shingles of md5(i || ':' || shingle) (hex order ≡ numeric
    order for fixed-length hex)."""
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)),
            )
        ),
    )
    return df.withColumn("minhash", sig)


def lsh_candidate_pairs(
    df: DataFrame, id_col: str = "doc_id", n_perm: int = 16, n_bands: int = 4
) -> DataFrame:
    """Band the signature (rows = n_perm/n_bands) and bucket-join: docs sharing
    any band key become candidate pairs (src < dst dedup'd across bands)."""
    rows = n_perm // n_bands
    banded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.concat_ws(
                    "|", F.slice(F.col("minhash"), b * rows + 1, rows)
                ),
            )
        ).alias("band", "key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst"))
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 16,
    n_bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH dedup: shingle → minhash → band-bucket join → verify
    candidates with EXACT shingle Jaccard (no false positives leave the op).

    The signature table is computed ONCE (repartitioned to all cores, then
    checkpointed) — it is consumed three times downstream (two banded join
    sides + the verify join) and recomputing the md5 permutations per branch
    would multiply the dominant cost."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        with_minhash(with_shingles(docs.repartition(par, id_col), text_col), n_perm)
        .select(id_col, "shingles", "minhash")
        .localCheckpoint(eager=True)
    )
    cand = lsh_candidate_pairs(sh, id_col, n_perm, n_bands)
    a = sh.select(F.col(id_col).alias("src"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("dst"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(a, "src")
        .join(b, "dst")
        .withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("src", "dst", "jaccard")
    )


# ------------------------------------------------------------------ n-gram Jaccard (blocked)
def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Exact n-gram Jaccard within blocks (equi-join on the blocking key keeps
    the pair count linear in block size, never corpus-quadratic)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        with_shingles(docs.repartition(par, id_col), text_col, n)
        .select(id_col, block_col, "shingles")
        .localCheckpoint(eager=True)
    )
    a = sh.select(F.col(block_col).alias("blk"), F.col(id_col).alias("src"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(block_col).alias("blk"), F.col(id_col).alias("dst"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        a.join(b, "blk")
        .where(F.col("src") < F.col("dst"))
        .withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )


# ------------------------------------------------------------------ SimHash
def _simhash_batch(texts: pd.Series, bits: int = 64) -> pd.Series:
    toks = (
        texts.fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9\s]", "", regex=True)
        .str.split()
    )
    out = np.zeros(len(texts), dtype=np.int64)
    cache: dict[str, np.ndarray] = {}
    for i, tl in enumerate(toks):
        if not tl:
            continue
        acc = np.zeros(bits, dtype=np.int64)
        for t in tl:
            bv = cache.get(t)
            if bv is None:
                h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
                bv = np.array([1 if (h >> j) & 1 else -1 for j in range(bits)], dtype=np.int64)
                cache[t] = bv
            acc += bv
        fp = 0
        for j in range(bits):
            if acc[j] > 0:
                fp |= 1 << j
        # store as signed int64
        out[i] = fp - (1 << 64) if fp >= (1 << 63) else fp
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return _simhash_batch(texts)


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup: 64-bit fingerprint (Arrow-vectorized UDF), then LSH on
    16-bit bands — a pair within Hamming distance <= 3 shares at least one of 4
    bands (pigeonhole); verified with exact popcount on the XOR."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    fp = (
        docs.repartition(par, id_col)
        .select(F.col(id_col), simhash_udf(F.col(text_col)).alias("fp"))
        .localCheckpoint(eager=True)
    )
    width = 64 // n_bands
    mask = (1 << width) - 1
    banded = fp.select(
        id_col,
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("fp"), b * width).bitwiseAND(F.lit(mask))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("src"),
            F.col(f"b.{id_col}").alias("dst"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming).select(
        "src", "dst", "hamming"
    )


# ------------------------------------------------------------------ embedding near-dup
def embedding_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-dup over an embedding column; blocked self-join when a
    blocking key is given, else LSH-style sign-bucket on the top component."""
    d = docs.withColumn("_v", F.col(vec_col).cast("array<double>"))
    if block_col is None:
        # cheap deterministic block: argmax |component| of the unit vector
        idx = F.expr(
            "array_position(transform(_v, x -> abs(x)), array_max(transform(_v, x -> abs(x))))"
        )
        d = d.withColumn("_blk", idx.cast("int"))
        block_col = "_blk"
    a = d.select(F.col(block_col).alias("blk"), F.col(id_col).alias("src"), F.col("_v").alias("va"))
    b = d.select(F.col(block_col).alias("blk"), F.col(id_col).alias("dst"), F.col("_v").alias("vb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.col("va"), F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(F.col("vb"), F.lit(0.0), lambda s, v: s + v * v))
    return (
        a.join(b, "blk")
        .where(F.col("src") < F.col("dst"))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .where(F.col("cosine") >= threshold)
        .select("src", "dst", "cosine")
    )
