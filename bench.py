"""Benchmark harness.

Default mode (driver contract): runs the headline workload at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
    {"metric": "...", "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: the north-rule evidence run — the SAME amplified corpus processed at
local[8] and local[32] (sandbox stand-in for N vs 4N executors), reporting
triples/sec at both plus scaling efficiency, written to BENCH/BASELINE.md.
The corpus is amplified (default 8 copies with distinct doc_ids) so compute
dominates fixed job overheads, as it would on a real cluster input.

--pipeline-only: internal child mode used by --scaling (one measurement in a
fresh JVM so the two parallelism levels don't share a SparkContext).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))


def amplified_corpus(sf_dir: str, amp: int) -> str:
    """Deterministically replicate the interleaved corpus amp× with distinct
    doc_ids (c<i>_<doc_id>). Cached under data/amplified/."""
    import pandas as pd

    from semantic_search_system_spark.fixtures.interleave import interleaved_path

    base = interleaved_path(sf_dir)
    if amp <= 1:
        return base
    sf = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(REPO, "data", "amplified", f"{sf}_x{amp}")
    out = os.path.join(out_dir, "documents_interleaved.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_parquet(base)
    copies = []
    for i in range(amp):
        c = df.copy()
        c["doc_id"] = f"c{i}_" + c["doc_id"]
        copies.append(c)
    pd.concat(copies, ignore_index=True).to_parquet(out + ".tmp", index=False)
    os.replace(out + ".tmp", out)
    return out


def run_pipeline_once(cpus: int, sf_dir: str, amp: int) -> dict:
    """One fresh, uncheckpointed pipeline run; returns timing + triple count."""
    from pyspark.sql import functions as F

    from semantic_search_system_spark.catalog import Catalog
    from semantic_search_system_spark.plans import pipeline as P
    from semantic_search_system_spark.session import get_spark

    spark = get_spark(f"bench-{cpus}", master=f"local[{cpus}]")
    corpus_path = amplified_corpus(sf_dir, amp)
    out = tempfile.mkdtemp(prefix="sss_bench_")
    try:
        cat = Catalog(out)
        t0 = time.time()
        docs = spark.read.parquet(corpus_path)
        # inline build_enriched over the (possibly amplified) corpus
        from semantic_search_system_spark.catalog import BUCKET_COL, with_bucket
        from semantic_search_system_spark.operators.embedding import with_embedding
        from semantic_search_system_spark.operators.extraction import (
            assemble_content,
            extract_entities_topics,
        )

        par = spark.sparkContext.defaultParallelism
        enriched = extract_entities_topics(
            with_embedding(assemble_content(with_bucket(docs, "doc_id", P.N_BUCKETS).repartition(par, "doc_id")))
        ).select(
            BUCKET_COL, "doc_id", "url", "title", "doc_date", "content", "summary",
            "entities", "topics", "embedding", "media_refs",
        )
        cat.commit_partitions(enriched, "enriched", stage="enrich")
        enr = cat.read(spark, "enriched")
        t_enrich = time.time() - t0

        t1 = time.time()
        tm = P.build_topic_map(spark, cat, enr)
        t_topic = time.time() - t1
        t2 = time.time()
        tr = P.build_triples(spark, cat, enr, tm)
        t_triples = time.time() - t2
        t3 = time.time()
        P.build_graph(spark, cat, enr, tr)
        t_graph = time.time() - t3
        n_triples = tr.count()
        total = time.time() - t0
        n_docs = docs.count()
        return {
            "cpus": cpus,
            "amp": amp,
            "docs": n_docs,
            "triples": n_triples,
            "enrich_sec": round(t_enrich, 2),
            "topic_map_sec": round(t_topic, 2),
            "triples_sec_stage": round(t_triples, 2),
            "graph_sec": round(t_graph, 2),
            "total_sec": round(total, 2),
            "triples_per_sec": round(n_triples / total, 1),
            "docs_per_sec": round(n_docs / total, 1),
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


HEADLINE_QUERIES = [
    "pricing_summary",
    "top5_entities_per_doc",
    "knn_cosine_top10",
    "ann_ivf_top10",
    "minhash_lsh_dedup",
    "search_pro",
    "search_pro_enhanced",
    "spans_kind_counts",
]


def default_bench(sf_dir: str, cpus: int) -> None:
    from semantic_search_system_spark import entrypoints as ep
    from semantic_search_system_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    # warm the session (JVM/codegen) so query timings measure the plans
    spark.range(1000).count()

    pipe = run_pipeline_once(cpus, sf_dir, amp=1)

    queries: dict[str, float] = {"kg_pipeline": pipe["total_sec"]}
    reg = ep.registry()
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        n = reg[name](spark, sf_dir).count()
        queries[name] = round(time.time() - t0, 3)

    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    result = {
        "metric": "kg_pipeline_and_headline_queries",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs": pipe["docs"],
        "triples": pipe["triples"],
        "triples_per_sec": pipe["triples_per_sec"],
        "cpus": cpus,
    }
    print(json.dumps(result))


def scaling_bench(sf_dir: str, amp: int) -> None:
    """Run the pipeline in fresh processes at local[8] and local[32]; write
    BENCH/BASELINE.md with throughput at both + scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--pipeline-only", "--cpus", str(cpus), "--amp", str(amp), "--sf-dir", sf_dir,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]['triples_per_sec']} triples/sec "
              f"({results[cpus]['total_sec']}s)", file=sys.stderr)

    r8, r32 = results[8], results[32]
    efficiency = r32["triples_per_sec"] / (4 * r8["triples_per_sec"])
    md = f"""# BENCH/BASELINE — measured numbers

Pipeline: full KG construction (enrich → canonicalize → triples → graph
materialize) over the deterministic interleaved corpus derived from
`{sf_dir}` amplified ×{amp} ({r8["docs"]:,} docs → {r8["triples"]:,} triples).
Same input for both runs; each run is a fresh JVM via `local[N]`
(sandbox stand-in for N vs 4N executors per the driver instruction).

| parallelism | docs | triples | wall (s) | triples/sec | docs/sec |
|---|---|---|---|---|---|
| local[8]  (N)  | {r8["docs"]:,} | {r8["triples"]:,} | {r8["total_sec"]} | {r8["triples_per_sec"]:,} | {r8["docs_per_sec"]:,} |
| local[32] (4N) | {r32["docs"]:,} | {r32["triples"]:,} | {r32["total_sec"]} | {r32["triples_per_sec"]:,} | {r32["docs_per_sec"]:,} |

**Scaling efficiency (N→4N)** = throughput(4N) / (4 × throughput(N)) =
{r32["triples_per_sec"]:,} / (4 × {r8["triples_per_sec"]:,}) = **{efficiency:.3f}**
(target ≥ 0.8, BASELINE.json.north_rule).

Stage breakdown (local[32]): enrich {r32["enrich_sec"]}s,
canonicalize {r32["topic_map_sec"]}s, triples {r32["triples_sec_stage"]}s,
graph {r32["graph_sec"]}s.

Reference comparison: the reference processes its 3,225-doc corpus strictly
sequentially with 4 network round-trips per document
(nlp/pr_aws_nlp.py:230-277); at its own documented retry/latency budget
(3×10 s retry ceiling, one Bedrock call per doc) it is bounded well below
10 docs/sec. This engine enriches {r32["docs_per_sec"]:,} docs/sec at local[32]
on the same per-doc semantics.

Raw JSON:
```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "queries": {"local8_triples_per_sec": r8["triples_per_sec"],
                    "local32_triples_per_sec": r32["triples_per_sec"]},
        "sf": sf_dir,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--amp", type=int, default=8)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.pipeline_only:
        print(json.dumps(run_pipeline_once(args.cpus, args.sf_dir, args.amp)))
    elif args.scaling:
        scaling_bench(args.sf_dir, args.amp)
    else:
        default_bench(args.sf_dir, args.cpus)


if __name__ == "__main__":
    main()
