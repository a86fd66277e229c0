"""Similarity search over embedding columns: exact brute-force top-k (baseline)
and IVF-style partitioned ANN (the scale path).

The reference delegates kNN to OpenSearch's HNSW index
(utils/create_vector_index.py:16-21, search_service.py:117). Spark has no ANN
index, so:

- ``brute_force_topk``: cross-join against the (broadcast) query vector +
  ``TakeOrderedAndProject`` — exact, one scan, fine up to ~10^7 vectors per
  query batch.
- ``ivf_assign`` / ``ivf_topk``: deterministic IVF — m coarse centroids
  (first-m seeding, k-means-free so it is reproducible in the SQL oracle),
  every vector assigned to its nearest centroid once (a small broadcast join),
  queries probe only the ``n_probe`` nearest centroid partitions. At cluster
  scale the assignment table is written bucketed by centroid id, so a probe
  reads only matching partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim


def brute_force_topk(
    vectors: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k of a literal query vector."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    d = vectors.withColumn("_v", F.col(vec_col).cast("array<double>"))
    return (
        d.select(id_col, F.round(cosine_sim(F.col("_v"), qv), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    vectors: DataFrame, n_centroids: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF: centroids = the first n vectors by id; each vector is
    assigned to the max-cosine centroid (ties → lowest centroid id).
    Returns (centroids, assignments)."""
    d = vectors.withColumn("_v", F.col(vec_col).cast("array<double>"))
    centroids = (
        d.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col("_v").alias("cvec"))
    )
    scored = d.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "_v",
        "centroid_id",
        F.round(cosine_sim(F.col("_v"), F.col("cvec")), 6).alias("csim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    assignments = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(id_col, "centroid_id", "_v")
    )
    return centroids, assignments


def ivf_topk(
    vectors: DataFrame,
    query_vec,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only the n_probe centroid partitions nearest the query."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    centroids, assignments = ivf_assign(vectors, n_centroids, id_col, vec_col)
    probed = (
        centroids.select("centroid_id", F.round(cosine_sim(F.col("cvec"), qv), 6).alias("qsim"))
        .orderBy(F.desc("qsim"), F.asc("centroid_id"))
        .limit(n_probe)
        .select("centroid_id")
    )
    return (
        assignments.join(F.broadcast(probed), "centroid_id")
        .select(id_col, F.round(cosine_sim(F.col("_v"), qv), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )
