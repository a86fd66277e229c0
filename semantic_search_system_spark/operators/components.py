"""Connected components as iterative DataFrame min-label propagation.

The reference canonicalizes phrases with in-memory complete-linkage clustering
(nlp/topic_modeling.py:31-36) — O(n²) rows in driver RAM. At 10^12-doc scale
the phrase/entity similarity graph must be clustered distributed; Spark has no
GraphFrames jar in this environment, so components are computed natively:

    label(v) ← min(label(v), min over neighbors' labels), iterate to fixpoint

Each iteration is one shuffle (edges ⋈ labels + groupBy-min, which partial-
aggregates map-side). Lineage is truncated every iteration with
``localCheckpoint`` — without it the plan grows exponentially. High-degree hub
nodes make the join skewed; AQE skew-join splitting is enabled session-wide and
the caller can pre-salt hot keys (see linking.candidate_edges).

Component id = lexicographic min node id, matching the golden union-find
(fixtures/golden.py) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Returns (node string, component string). Edges are treated undirected;
    isolated nodes must appear as self-edges or be unioned by the caller."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("component")
        )
        new_labels = (
            msgs.union(labels.select("node", "component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
