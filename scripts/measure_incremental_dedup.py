"""Measure what the signature store buys: full-corpus MinHash dedup vs the
epoch-incremental path (only the ~20% epoch hashed, history read from the
committed store) as the corpus grows.

The sandbox corpus is amplified deterministically: copy k of each doc has
every token suffixed with k, so copies are fully distinct (no artificial
cross-copy near-dups — the pair count stays linear in the amplification,
like a real corpus). The dup planting (dup_<id> with an ' extradup' suffix)
is applied within each copy, preserving the ~1% near-dup rate at every size.

Usage: python scripts/measure_incremental_dedup.py [--amps 1,4,16] [--reps 2]
Writes BENCH/INCREMENTAL_DEDUP.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplified_corpus(spark, sf_dir: str, amp: int):
    from semantic_search_system_spark.entrypoints import load

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    parts = []
    for k in range(amp):
        # suffix every token with the copy index -> copies share no shingles
        txt = F.array_join(
            F.transform(F.split("text", " "), lambda t: F.concat(t, F.lit(str(k)))),
            " ",
        )
        base = d.select(
            F.concat(F.lit(f"{k}_"), F.col("doc_id")).alias("doc_id"),
            txt.alias("text"),
        )
        dups = base.where(F.split("doc_id", "_")[1].cast("long") < 50).select(
            F.concat(F.lit("dup_"), F.col("doc_id")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extradup")).alias("text"),
        )
        parts.append(base.unionByName(dups))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--amps", default="1,4,16")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from semantic_search_system_spark.catalog import Catalog, with_bucket
    from semantic_search_system_spark.entrypoints import _incr_is_new
    from semantic_search_system_spark.operators.dedup import (
        incremental_minhash_near_dups,
        minhash_near_dups,
        with_minhash,
        with_shingles,
    )
    from semantic_search_system_spark.session import get_spark

    spark = get_spark("incr-dedup-bench", master=f"local[{args.cpus}]")
    spark.range(1000).count()

    rows = []
    for amp in [int(a) for a in args.amps.split(",")]:
        corpus = amplified_corpus(spark, SF_DIR, amp)
        n = corpus.count()
        is_new = _incr_is_new(F.col("doc_id"))
        n_new = corpus.where(is_new).count()
        # build the store ONCE, untimed (it is a committed artifact in
        # production, amortized over every epoch it serves)
        root = tempfile.mkdtemp(prefix="sss_incr_store_")
        cat = Catalog(root)
        sigs = with_minhash(
            with_shingles(corpus.where(~is_new)).select("doc_id", "shingles")
        )
        cat.overwrite(with_bucket(sigs, "doc_id", 8), "minhash_sigs", stage="bench")
        old_sigs = cat.read(spark, "minhash_sigs").select("doc_id", "minhash")
        try:
            t_full, t_incr, pairs_full, pairs_incr = [], [], 0, 0
            for _ in range(args.reps):
                t0 = time.time()
                pairs_full = minhash_near_dups(corpus, jaccard_threshold=0.5).count()
                t_full.append(time.time() - t0)
                t0 = time.time()
                pairs_incr = incremental_minhash_near_dups(
                    corpus, is_new, old_sigs, jaccard_threshold=0.5
                ).count()
                t_incr.append(time.time() - t0)
            rows.append(
                {
                    "amp": amp, "docs": n, "epoch_docs": n_new,
                    "full_sec": round(min(t_full), 2),
                    "incr_sec": round(min(t_incr), 2),
                    "full_pairs": pairs_full, "incr_pairs": pairs_incr,
                    "speedup": round(min(t_full) / min(t_incr), 2),
                }
            )
            print(rows[-1], flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    lines = [
        "# Incremental dedup vs full rerun (what the signature store buys)",
        "",
        f"Same near-dup semantics, sf0.1 corpus amplified with fully-distinct copies",
        f"(pair count stays linear); epoch = the ~20% md5 split; store built untimed",
        f"(a committed artifact amortized over every epoch it serves); best of",
        f"{args.reps} alternating draws at local[{args.cpus}].",
        "",
        "| amp | docs | epoch docs | full rerun (s) | incremental (s) | speedup | pairs full/incr |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| x{r['amp']} | {r['docs']:,} | {r['epoch_docs']:,} | {r['full_sec']} "
            f"| {r['incr_sec']} | {r['speedup']}x | {r['full_pairs']}/{r['incr_pairs']} |"
        )
    lines += [
        "",
        "The full rerun re-shingles and re-hashes the whole corpus every time;",
        "the incremental path's doc-proportional work is the epoch only, plus a",
        "map-only scan of the store's n_perm longs/doc — the gap widens with",
        "corpus size, which is the 100-TB argument: at 10^12 docs a full rerun",
        "per arriving epoch is not a plan, the store scan is.",
        "",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/INCREMENTAL_DEDUP.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/INCREMENTAL_DEDUP.md")


if __name__ == "__main__":
    main()
