"""Incremental processing: the reference's batch work-queue protocol upgraded
to Structured Streaming.

The reference processes documents incrementally with a ``processed`` boolean
flag flipped after each bulk write (ingest/pr_meta_store.py:55-139) and a
straggler sweep (:142-194). Two Spark-native equivalents live here:

1. ``enrich_stream``: a Structured Streaming pipeline — ``readStream`` over the
   interleaved table directory, the SAME assemble/extract/embed transforms as
   the batch plan (one logical plan, two execution modes), ``foreachBatch``
   into the checkpointed Catalog so delivery is idempotent at partition
   granularity (exactly-once effective semantics).
2. ``windowed_event_metrics``: watermarked event-time windowed aggregation over
   the events table — the late-data-tolerant version of the reference's
   per-month counters (pr_aws_nlp.py:226-283).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def enrich_stream(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
):
    """Stream the interleaved corpus through the enrichment stages into the
    Catalog. Returns the started StreamingQuery (caller awaits/stops)."""
    from ..catalog import Catalog, with_bucket
    from ..operators.enrichment import enrich_content
    from ..operators.extraction import assemble_content

    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    cat = Catalog(out_root)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # the SAME fused enrich stage as the batch plan (one logical plan,
        # two execution modes) — Arrow-RE2 clean + shared token stream
        enriched = enrich_content(assemble_content(batch_df, clean=False))
        enriched = with_bucket(enriched, "doc_id", n_buckets)
        # Epoch-scope the partition key: each micro-batch owns its own
        # `<epoch>_<bucket>` partitions. A replayed epoch (foreachBatch may
        # re-deliver after a failure) hits already-manifested keys and is
        # skipped (exactly-once effective); a NEW epoch always lands in fresh
        # partitions — without this, epoch 1 claims all n_buckets keys and
        # every later micro-batch would be silently dropped.
        enriched = enriched.withColumn(
            "bucket", F.concat_ws("_", F.lit(int(epoch_id)), F.col("bucket"))
        ).select(
            "bucket", "doc_id", "url", "title", "doc_date", "content", "summary",
            "entities", "topics", "embedding", "media_refs",
        )
        cat.commit_partitions(enriched, "enriched_stream", stage=f"stream_epoch_{epoch_id}")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def triples_stream(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
):
    """INCREMENTAL KG MAINTENANCE: stream interleaved documents straight to
    (subj, pred, obj) triples — the same fused enrich UDF and the same
    map-only MENTIONS/HAS_TOPIC emission as the batch stage
    (plans.pipeline.mention_topic_triples: one logical plan, two execution
    modes), committed per epoch into ``triples_stream`` with the
    epoch-scoped partition keys that make replay idempotent and
    ``compact_stream_epochs`` applicable.

    Scope (documented split, lambda-architecture style): the MENTIONS and
    HAS_TOPIC branches are PER-DOCUMENT (map-only — streamable exactly);
    the RELATES_TO_DOC branch depends on the corpus-global phrase
    canonicalization (topic_map), which only the batch stage refreshes —
    streaming a clustering would silently re-label past epochs. A batch
    ``build_triples`` run over the accumulated corpus reconciles it."""
    from ..catalog import Catalog, with_bucket
    from ..operators.enrichment import enrich_content
    from ..operators.extraction import assemble_content
    from ..plans.pipeline import mention_topic_triples

    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    cat = Catalog(out_root)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        enriched = enrich_content(assemble_content(batch_df, clean=False))
        enriched = with_bucket(enriched, "doc_id", n_buckets)
        triples = mention_topic_triples(enriched)
        triples = triples.withColumn(
            "bucket", F.concat_ws("_", F.lit(int(epoch_id)), F.col("bucket"))
        ).select("bucket", "subj", "pred", "obj")
        cat.commit_partitions(triples, "triples_stream", stage=f"stream_epoch_{epoch_id}")

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def sessionize_stream(spark: SparkSession, input_dir: str, gap_seconds: int = 1800):
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``: the
    batch sessionizer (gap > 30 min ⇒ new session, order (ts, event_id) —
    entrypoints.sessionize_users) as an incremental per-user running count.

    State per user = (last event epoch-seconds, session count so far); each
    micro-batch folds its (sorted) events into the state and emits the updated
    cumulative count — the streaming-native form of the reference's
    work-queue incremental processing (pr_meta_store.py:55-139), here with
    CROSS-BATCH state rather than a per-batch recompute. Event-time order is
    the micro-batch arrival order (time-partitioned input files), the standard
    contract for processing-time sessionization.

    Returns the unstarted streaming DataFrame (caller attaches the sink)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def update(key, pdfs, state):
        import numpy as np  # noqa: PLC0415 — worker-side import

        (user,) = key
        last_ts, n = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        # vectorized fold: a session starts wherever the gap to the previous
        # event (carry-in = state's last_ts) exceeds the threshold — one numpy
        # diff over the batch, no per-event Python
        ets = (batch["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64) / 1e9)
        if len(ets):
            prev = np.concatenate(([np.nan if last_ts is None else last_ts], ets[:-1]))
            gaps = ets - prev
            n += int(np.count_nonzero(np.isnan(gaps) | (gaps > gap_seconds)))
            last_ts = float(ets[-1])
        state.update((float(last_ts), int(n)))
        yield pd.DataFrame({"user_id": [user], "n_sessions": [n]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_sessions long",
        stateStructType="last_ts double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_metrics(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked sliding-window event metrics (works on a stream or a batch DF)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
