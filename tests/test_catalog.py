import os

import pytest
from pyspark.sql import functions as F

from semantic_search_system_spark.catalog import BUCKET_COL, Catalog, with_bucket


@pytest.fixture()
def sample(spark):
    return with_bucket(
        spark.range(100).select(F.col("id").cast("string").alias("doc_id"), (F.col("id") * 2).alias("v")),
        "doc_id",
        4,
    )


def test_commit_and_read_roundtrip(spark, tmp_root, sample):
    cat = Catalog(tmp_root)
    committed = cat.commit_partitions(sample, "t", stage="s1")
    assert len(committed) == 4
    back = cat.read(spark, "t")
    assert back.count() == 100
    assert set(back.columns) == {"doc_id", "v", BUCKET_COL}
    assert cat.completed_buckets("t") == {0, 1, 2, 3}
    assert cat.pending_buckets("t", 4) == []


def test_completed_partitions_never_rewritten(spark, tmp_root, sample):
    cat = Catalog(tmp_root)
    cat.commit_partitions(sample.where(F.col(BUCKET_COL) == 0), "t", stage="s1")
    rows0 = cat.read(spark, "t").count()
    # a second commit carrying bucket 0 with DIFFERENT data must not touch it
    mutated = sample.withColumn("v", F.col("v") + 1000)
    cat.commit_partitions(mutated, "t", stage="s2")
    back = cat.read(spark, "t")
    assert back.count() == 100
    b0 = back.where(F.col(BUCKET_COL) == 0)
    assert b0.where(F.col("v") >= 1000).count() == 0  # original rows preserved
    assert b0.count() == rows0


def test_replayed_epoch_after_compaction_not_recommitted(spark, tmp_root, sample):
    """The unclean-stop replay hazard (round-5 ADVICE, medium): a stream that
    crashed after commit_partitions but BEFORE its checkpoint recorded the
    batch replays that epoch on restart. If compaction ran in between, the
    epoch's `<epoch>_<bucket>` keys are gone from the manifest's partitions —
    the keys must survive as tombstones (snapshots' compacted_from) so the
    replay is skipped, not committed a second time."""
    cat = Catalog(tmp_root)
    epoch = sample.withColumn(
        BUCKET_COL, F.concat_ws("_", F.lit(0), F.col(BUCKET_COL))
    )
    cat.commit_partitions(epoch, "es", stage="stream_epoch_0")
    assert cat.read(spark, "es").count() == 100
    assert cat.compact_stream_epochs(spark, "es")
    # the crash-replay: the SAME epoch keys arrive again post-compaction
    cat.commit_partitions(epoch, "es", stage="stream_epoch_0")
    back = cat.read(spark, "es")
    assert back.count() == 100  # not 200 — replay fell on tombstones
    assert back.select("doc_id").distinct().count() == 100
    # and a genuinely NEW epoch still lands normally
    epoch1 = sample.withColumn(
        BUCKET_COL, F.concat_ws("_", F.lit(1), F.col(BUCKET_COL))
    ).withColumn("doc_id", F.concat(F.lit("n"), F.col("doc_id")))
    cat.commit_partitions(epoch1, "es", stage="stream_epoch_1")
    assert cat.read(spark, "es").count() == 200


def test_tombstone_hit_from_foreign_stage_raises(spark, tmp_root, sample):
    """Round-6 ADVICE: a stream restarted on a FRESH (or deleted) checkpoint
    restarts epoch ids at 0 — genuinely new data arriving under a
    previously-compacted '<epoch>_<bucket>' key must RAISE, not be silently
    dropped (the mirror image of the replay-doubling the tombstones fix).
    The committing stage embeds the checkpoint identity, so a crash replay
    (same stage) still skips while a foreign stage is refused."""
    cat = Catalog(tmp_root)
    epoch = sample.withColumn(BUCKET_COL, F.concat_ws("_", F.lit(0), F.col(BUCKET_COL)))
    cat.commit_partitions(epoch, "es", stage="stream_epoch_0 ckpt=aaaa1111")
    assert cat.compact_stream_epochs(spark, "es")
    # crash replay from the SAME checkpoint: skipped, reads unchanged
    cat.commit_partitions(epoch, "es", stage="stream_epoch_0 ckpt=aaaa1111")
    assert cat.read(spark, "es").count() == 100
    # NEW data from a DIFFERENT checkpoint reusing the compacted key: refused
    fresh = epoch.withColumn("doc_id", F.concat(F.lit("n"), F.col("doc_id")))
    with pytest.raises(ValueError, match="reused key"):
        cat.commit_partitions(fresh, "es", stage="stream_epoch_0 ckpt=bbbb2222")
    assert cat.read(spark, "es").count() == 100


def test_table_properties_roundtrip(tmp_root):
    cat = Catalog(tmp_root)
    assert cat.get_property("t", "covers") is None
    cat.set_property("t", "covers", {"0_1": "snap"})
    cat.set_property("t", "params", [8, 3])
    assert cat.get_property("t", "covers") == {"0_1": "snap"}
    assert cat.get_property("t", "params") == [8, 3]
    # properties survive a manifest rewrite by an unrelated commit path
    assert Catalog(tmp_root).get_property("t", "covers") == {"0_1": "snap"}


def test_overwrite_replaces_table(spark, tmp_root, sample):
    """S8 graph-rebuild semantics (knowledge_graph.py:58-107)."""
    cat = Catalog(tmp_root)
    cat.commit_partitions(sample, "t", stage="s1")
    smaller = sample.where(F.col("v") < 50)
    cat.overwrite(smaller, "t", stage="rebuild")
    assert cat.read(spark, "t").count() == 25
    assert len(cat.manifest("t")["snapshots"]) == 1  # fresh history


def test_metrics_lineage_rows(spark, tmp_root, sample):
    cat = Catalog(tmp_root)
    cat.commit_partitions(sample, "t", stage="s1")
    m = cat.metrics("t")
    assert len(m) == 4
    for e in m:
        assert e["stage"] == "s1"
        assert e["rows_written"] > 0
        assert "snapshot_id" in e and "completed_at" in e and "wall_ms" in e
    assert sum(e["rows_written"] for e in m) == 100


def test_json_source_sink_roundtrip(spark, tmp_root):
    """S3: JSON file sink/source with explicit schema (no inference)."""
    df = spark.range(10).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("name")
    )
    path = os.path.join(tmp_root, "j")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("id long, name string").json(path)
    assert back.count() == 10
    assert {r["name"] for r in back.collect()} == {f"u{i}" for i in range(10)}


def test_crash_mid_write_recovers(spark, tmp_root, sample):
    """A run killed mid-commit (orphan staging dir + missing manifest entries)
    must resume cleanly: orphans reclaimed, pending partitions recomputed,
    final table identical to an uninterrupted run."""
    cat = Catalog(tmp_root)
    # simulate a crash: half the buckets committed, plus an orphaned staging dir
    cat.commit_partitions(sample.where(F.col(BUCKET_COL) < 2), "t", stage="s1")
    orphan = os.path.join(cat.path("t"), "_staging_deadbeef")
    os.makedirs(os.path.join(orphan, f"{BUCKET_COL}=3"), exist_ok=True)
    with open(os.path.join(orphan, f"{BUCKET_COL}=3", "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert cat.pending_buckets("t", 4) == [2, 3]
    # resume: only pending buckets written; orphan reclaimed
    cat.commit_partitions(sample.where(F.col(BUCKET_COL).isin([2, 3])), "t", stage="s1")
    assert not any(d.startswith("_staging_") for d in os.listdir(cat.path("t")))
    assert cat.read(spark, "t").count() == 100
    assert cat.completed_buckets("t") == {0, 1, 2, 3}


def test_zero_partition_table_reads_back_empty(spark, tmp_root):
    """A table committed with zero rows (e.g. failed_rows on a clean corpus)
    must read back as a typed empty DataFrame, not crash on a dir-less scan."""
    from pyspark.sql import functions as F

    from semantic_search_system_spark.catalog import Catalog

    cat = Catalog(tmp_root)
    empty = (
        spark.range(0)
        .select(
            F.col("id").cast("string").alias("doc_id"),
            F.lit("enrich").alias("stage"),
        )
        .withColumn("bucket", F.lit(0))
    )
    cat.commit_partitions(empty, "failed_rows", stage="quarantine")
    assert cat.exists("failed_rows")
    back = cat.read(spark, "failed_rows")
    assert back.count() == 0
    assert set(back.columns) == {"doc_id", "stage", "bucket"}
    # read_buckets of only-missing partitions is a valid empty miss too
    assert cat.read_buckets(spark, "failed_rows", [5, 6]).count() == 0


def test_legacy_tombstone_replay_after_upgrade_skips(spark, tmp_root, sample):
    """Upgrade path for the tombstone stage guard: an epoch committed by
    PRE-checkpoint-identity code (stage without ' ckpt=') and compacted away
    can be replayed by the SAME stream after an upgrade — the replay now
    carries the new stage format, and the legacy tombstone can't tell it
    from new data. The guard must fall back to the legacy skip (never
    doubling rows, never raising) instead of permanently halting a stream
    that did exactly what the error message asks: resume its checkpoint."""
    cat = Catalog(tmp_root)
    epoch = sample.withColumn(BUCKET_COL, F.concat_ws("_", F.lit(0), F.col(BUCKET_COL)))
    cat.commit_partitions(epoch, "es", stage="stream_epoch_0")  # pre-upgrade format
    assert cat.compact_stream_epochs(spark, "es")
    # post-upgrade crash replay of the same epoch, same checkpoint
    cat.commit_partitions(epoch, "es", stage="stream_epoch_0 ckpt=aaaa1111")
    assert cat.read(spark, "es").count() == 100  # skipped: not doubled, not raised


def test_set_properties_single_save(tmp_root):
    """The doc-IVF covers/params/fit_rows triple must land in ONE manifest
    save — a crash can never publish a subset (which would disable the
    serve/append fast path and send the next call down the rebuild path)."""
    cat = Catalog(tmp_root)
    cat.set_properties(
        "t", {"covers": {"0_1": "s"}, "params": [8, 3], "fit_rows": 10}
    )
    fresh = Catalog(tmp_root)
    assert fresh.get_property("t", "covers") == {"0_1": "s"}
    assert fresh.get_property("t", "params") == [8, 3]
    assert fresh.get_property("t", "fit_rows") == 10
