"""spark-submit entry point for the KG construction pipeline.

Usage (north rule: `spark-submit --py-files` on a multi-executor cluster):

    zip -r /tmp/sss.zip semantic_search_system_spark
    spark-submit --master local[8] --py-files /tmp/sss.zip \\
        scripts/spark_submit_pipeline.py <sf_dir> <out_root> [n_buckets]

On a real cluster replace --master with the cluster manager and size
--num-executors/--executor-cores as usual; the package itself needs no code
changes (the session builder only sets cluster-safe confs).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sss_submit_out"
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    # spark-submit owns master/deploy-mode; just attach to the provided session
    spark = SparkSession.builder.appName("sss-kg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from semantic_search_system_spark.plans.pipeline import run_pipeline

    cat = run_pipeline(spark, sf_dir, out_root, n_buckets)
    triples = cat.read(spark, "triples")
    nodes = cat.read(spark, "nodes")
    edges = cat.read(spark, "edges")
    print(
        f"PIPELINE_OK triples={triples.count()} nodes={nodes.count()} "
        f"edges={edges.count()} out={out_root}"
    )


if __name__ == "__main__":
    main()
