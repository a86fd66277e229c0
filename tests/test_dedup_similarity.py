import pandas as pd
from pyspark.sql import functions as F

from semantic_search_system_spark.operators.dedup import (
    minhash_near_dups,
    ngram_jaccard_pairs,
    simhash_near_dups,
    with_shingles,
)
from semantic_search_system_spark.operators.similarity import brute_force_topk, ivf_topk

from conftest import SF_SMALL


def _dup_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [
        ("a", base),
        ("a_copy", base),                       # exact dup
        ("a_near", base + " lambda mu"),        # near dup
        ("other", "one two three four five six seven eight nine ten " * 5),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_shingles_small_doc(spark):
    d = spark.createDataFrame([("x", "a b"), ("y", "")], "doc_id string, text string")
    rows = {r["doc_id"]: r["shingles"] for r in with_shingles(d).collect()}
    assert rows["x"] == ["a b"]


def test_minhash_finds_planted_dups(spark):
    pairs = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in minhash_near_dups(_dup_docs(spark), jaccard_threshold=0.5).collect()
    }
    assert pairs[("a", "a_copy")] == 1.0
    assert ("a", "a_near") in pairs and pairs[("a", "a_near")] >= 0.5
    assert not any("other" in p for pair in pairs for p in pair)


def test_simhash_identical_docs_hamming_zero(spark):
    rows = {
        (r["src"], r["dst"]): r["hamming"]
        for r in simhash_near_dups(_dup_docs(spark), max_hamming=8).collect()
    }
    assert rows[("a", "a_copy")] == 0


def test_ngram_jaccard_blocked(spark):
    d = _dup_docs(spark).withColumn("source", F.lit("s1"))
    pairs = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, threshold=0.5).collect()
    }
    assert pairs[("a", "a_copy")] == 1.0


def test_ivf_recall_vs_bruteforce(spark):
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = e.where(F.col("vec_id") == 1).select("embedding").collect()[0][0]
    exact = [r["vec_id"] for r in brute_force_topk(e, q, k=10).collect()]
    # probing every centroid partition must reproduce the exact result
    full_probe = [r["vec_id"] for r in ivf_topk(e, q, k=10, n_centroids=8, n_probe=8).collect()]
    assert full_probe == exact
    # 2-probe ANN: reasonable recall on the top-10
    approx = [r["vec_id"] for r in ivf_topk(e, q, k=10, n_centroids=8, n_probe=2).collect()]
    assert len(set(approx) & set(exact)) >= 3
