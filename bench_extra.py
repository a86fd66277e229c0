"""Round-8 optimization instrumentation — SEPARATE from the frozen bench.py
(the driver times the round with the round-start bench.py; this file only
feeds OPTIMIZATION_r08.md).

Modes:
  --plans SUFFIX   write .explain("formatted") for every headline query to
                   plans/r08/<query>_<SUFFIX>.txt (guide §7.2 — the judge
                   checks plan claims against these files)
  --noop           per-query noop-sink isolation timings, best-of-3
                   (guide §1.4: count() lets the optimizer prune; the noop
                   sink computes every column of every row)
  --count          per-query .count() timings best-of-3 (the frozen bench.py
                   methodology, for apples-to-apples deltas)

All modes run at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], the same session shape as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))

# the frozen bench.py headline set (minus kg_pipeline, which is a multi-stage
# build, not one DataFrame — its stage timings come from bench.py itself)
QUERY_NAMES = [
    "pricing_summary",
    "top5_entities_per_doc",
    "knn_cosine_top10",
    "ann_ivf_top10",
    "minhash_lsh_dedup",
    "incremental_minhash_dedup",
    "search_pro",
    "search_pro_ann",
    "search_pro_enhanced",
    "search_pro_enhanced_ann",
    "search_kb_ann",
    "search_advanced_ann",
    "search_simple",
    "search_advanced",
    "search_kb",
    "graph_degree_topk",
    "graph_related_docs",
    "graph_pagerank",
    "spans_kind_counts",
]


def _spark(cpus: int):
    from semantic_search_system_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{cpus}]")
    spark.range(1000).count()  # JVM warmup
    return spark


def capture_plans(sf_dir: str, cpus: int, suffix: str, names: list[str]) -> None:
    from semantic_search_system_spark import entrypoints as ep

    spark = _spark(cpus)
    out_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    reg = ep.registry()
    for name in names:
        df = reg[name](spark, sf_dir)  # materializes ensure_* side effects
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)", file=sys.stderr)


def time_queries(sf_dir: str, cpus: int, mode: str, names: list[str]) -> None:
    from semantic_search_system_spark import entrypoints as ep

    spark = _spark(cpus)
    reg = ep.registry()
    # one warm pass so ensure_* builds (enriched table, indexes) are paid
    # before any timed run — identical to the steady state bench.py measures
    for name in names:
        reg[name](spark, sf_dir).count()
    out: dict[str, dict] = {}
    for name in names:
        times = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"{mode}: {name}")
            t0 = time.time()
            df = reg[name](spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "spread": sorted(times)}
        print(f"{name}: {min(times)}s {sorted(times)}", file=sys.stderr)
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "cpus": cpus, "queries": out}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", metavar="SUFFIX")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    args = ap.parse_args()
    names = args.queries if args.queries else QUERY_NAMES
    if args.plans:
        capture_plans(args.sf_dir, args.cpus, args.plans, names)
    if args.noop:
        time_queries(args.sf_dir, args.cpus, "noop", names)
    if args.count:
        time_queries(args.sf_dir, args.cpus, "count", names)


if __name__ == "__main__":
    main()
