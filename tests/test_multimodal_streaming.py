import numpy as np
import pytest

from semantic_search_system_spark.fixtures.interleave import interleaved_path
from semantic_search_system_spark.operators.multimodal import (
    decode_media,
    extract_media_features,
    media_spans,
)
from semantic_search_system_spark.streaming.incremental import (
    enrich_stream,
    windowed_event_metrics,
)

from conftest import SF_SMALL


def test_decode_stub_modes():
    fake = decode_media("media://abc", "image", fake=True)
    assert len(fake) == 64 and fake == decode_media("media://abc", "image", fake=True)
    with pytest.raises(NotImplementedError):
        decode_media("media://abc", "image", fake=False)


def test_media_feature_extraction(spark):
    inter = spark.read.parquet(interleaved_path(SF_SMALL))
    media = media_spans(inter)
    n_media = media.count()
    assert n_media > 0
    feats = extract_media_features(media)
    rows = feats.collect()
    # videos explode to 3 frames, image/audio to 1
    by_kind = {}
    for r in rows:
        by_kind.setdefault((r["media_ref"], r["kind"]), []).append(r)
    for (ref, kind), items in by_kind.items():
        assert len(items) == (3 if kind == "video" else 1)
        for r in items:
            assert r["decode_ok"] is True
            v = np.asarray(r["features"], dtype=np.float32)
            assert v.shape == (32,)
            assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # deterministic across runs
    again = {(r["media_ref"], r["frame"]): list(r["features"]) for r in feats.collect()}
    first = {(r["media_ref"], r["frame"]): list(r["features"]) for r in rows}
    assert again == first


def test_enrich_stream_matches_batch(spark, tmp_root):
    import os

    from semantic_search_system_spark.catalog import Catalog
    from semantic_search_system_spark.plans.pipeline import build_enriched

    inter_dir = os.path.dirname(interleaved_path(SF_SMALL))
    q = enrich_stream(
        spark,
        inter_dir,
        os.path.join(tmp_root, "out"),
        os.path.join(tmp_root, "ckpt"),
    )
    q.awaitTermination(120)
    cat = Catalog(os.path.join(tmp_root, "out"))
    streamed = cat.read(spark, "enriched_stream")
    batch = build_enriched(spark, SF_SMALL, Catalog(os.path.join(tmp_root, "batch")))
    s_rows = {
        r["doc_id"]: (tuple(e["text"] for e in r["entities"]), r["summary"])
        for r in streamed.select("doc_id", "entities", "summary").collect()
    }
    b_rows = {
        r["doc_id"]: (tuple(e["text"] for e in r["entities"]), r["summary"])
        for r in batch.select("doc_id", "entities", "summary").collect()
    }
    assert s_rows == b_rows and len(s_rows) == 500


def test_enrich_stream_multi_epoch_no_data_loss(spark, tmp_root):
    """Regression (ADVICE r01 high): with >maxFilesPerTrigger input files the
    stream runs multiple epochs; epoch 1 must NOT claim all manifest buckets
    and silently drop every later micro-batch. 8 input files at
    maxFilesPerTrigger=4 forces >=2 epochs; streamed output must equal the
    full corpus."""
    import os

    from semantic_search_system_spark.catalog import Catalog

    # re-write the sf0.001 corpus as 8 separate parquet files
    multi_dir = os.path.join(tmp_root, "multi_file_input")
    spark.read.parquet(interleaved_path(SF_SMALL)).repartition(8).write.parquet(multi_dir)
    n_files = len([f for f in os.listdir(multi_dir) if f.endswith(".parquet")])
    assert n_files == 8

    q = enrich_stream(
        spark,
        multi_dir,
        os.path.join(tmp_root, "out"),
        os.path.join(tmp_root, "ckpt"),
    )
    q.awaitTermination(180)
    cat = Catalog(os.path.join(tmp_root, "out"))
    man = cat.manifest("enriched_stream")
    epochs = {e["stage"] for e in man["snapshots"]}
    assert len(epochs) >= 2, f"expected multiple epochs, got {epochs}"
    streamed = cat.read(spark, "enriched_stream")
    assert streamed.count() == 500
    assert streamed.select("doc_id").distinct().count() == 500


def test_compact_stream_epochs_preserves_reads_and_resume(spark, tmp_root):
    """Epoch compaction (round-4 VERDICT #6): folding `<epoch>_<bucket>`
    partitions into canonical `c<gen>_<bucket>` buckets must (a) leave reads
    byte-equal, (b) be an idempotent no-op when there is nothing to fold,
    (c) coexist with checkpoint resume — later stream epochs land in fresh
    partitions and a second compaction folds them INTO the prior generation —
    and (d) sweep debris from an interrupted compaction."""
    import os
    import shutil

    from semantic_search_system_spark.catalog import Catalog

    src = os.path.join(tmp_root, "in")
    spark.read.parquet(interleaved_path(SF_SMALL)).repartition(8).write.parquet(src)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    later = os.path.join(tmp_root, "later")
    os.makedirs(later)
    for f in files[4:]:  # hold half the corpus back for the resume leg
        shutil.move(os.path.join(src, f), os.path.join(later, f))

    out, ckpt = os.path.join(tmp_root, "out"), os.path.join(tmp_root, "ckpt")
    enrich_stream(spark, src, out, ckpt).awaitTermination(120)
    cat = Catalog(out)

    def snap(df):
        return {r["doc_id"]: r["summary"] for r in df.select("doc_id", "summary").collect()}

    pre = snap(cat.read(spark, "enriched_stream"))
    assert cat.compact_stream_epochs(spark, "enriched_stream")
    man = cat.manifest("enriched_stream")
    assert all(k.startswith("c1_") for k in man["partitions"]), man["partitions"].keys()
    assert snap(cat.read(spark, "enriched_stream")) == pre
    # idempotent: nothing left to fold
    assert cat.compact_stream_epochs(spark, "enriched_stream") == {}

    # per-partition lineage metrics carry the compaction stage (north_star
    # 'per-partition lineage and metrics'; round-5 VERDICT #7): every live
    # partition's stage is compact_gen1 and the wall-clock was recorded
    rows = cat.metrics("enriched_stream")
    assert rows and all(r["stage"] == "compact_gen1" for r in rows)
    assert all(r["wall_ms"] >= 0 and r["rows_written"] > 0 for r in rows)

    # resume on the same checkpoint: the held-back files arrive as new epochs
    for f in files[4:]:
        shutil.move(os.path.join(later, f), os.path.join(src, f))
    enrich_stream(spark, src, out, ckpt).awaitTermination(120)
    post = snap(cat.read(spark, "enriched_stream"))
    assert len(post) == 500 and set(pre).issubset(post)
    # the resumed epochs' own lineage is visible beside the compacted gen
    stages = {r["stage"] for r in cat.metrics("enriched_stream")}
    assert "compact_gen1" in stages and any(s.startswith("stream_epoch_") for s in stages)

    # interrupted-compaction debris is swept; gen 2 folds new epochs into gen 1
    os.makedirs(os.path.join(out, "enriched_stream", "bucket=zzz_9"))
    os.makedirs(os.path.join(out, "enriched_stream", "_compacting_dead"))
    assert cat.compact_stream_epochs(spark, "enriched_stream")
    man = cat.manifest("enriched_stream")
    assert all(k.startswith("c2_") for k in man["partitions"]), man["partitions"].keys()
    assert not os.path.exists(os.path.join(out, "enriched_stream", "bucket=zzz_9"))
    assert not os.path.exists(os.path.join(out, "enriched_stream", "_compacting_dead"))
    assert snap(cat.read(spark, "enriched_stream")) == post


def test_triples_stream_matches_batch(spark, tmp_root):
    """Incremental KG maintenance: streaming the corpus in multiple epochs
    through triples_stream must produce EXACTLY the batch pipeline's
    MENTIONS/HAS_TOPIC triple set (same fused enrich, same emission — one
    logical plan, two execution modes), and epoch compaction must leave the
    set byte-equal. The RELATES branch is the documented batch-only
    reconciliation (it depends on corpus-global canonicalization)."""
    import os

    from pyspark.sql import functions as F

    from semantic_search_system_spark import spec
    from semantic_search_system_spark.catalog import Catalog
    from semantic_search_system_spark.plans.pipeline import (
        build_enriched,
        build_topic_map,
        build_triples,
    )
    from semantic_search_system_spark.streaming.incremental import triples_stream

    multi_dir = os.path.join(tmp_root, "in")
    spark.read.parquet(interleaved_path(SF_SMALL)).repartition(8).write.parquet(multi_dir)

    out = os.path.join(tmp_root, "out")
    q = triples_stream(spark, multi_dir, out, os.path.join(tmp_root, "ckpt"))
    q.awaitTermination(180)
    cat = Catalog(out)
    assert len({e["stage"] for e in cat.manifest("triples_stream")["snapshots"]}) >= 2

    bcat = Catalog(os.path.join(tmp_root, "batch"))
    enr = build_enriched(spark, SF_SMALL, bcat)
    tm = build_topic_map(spark, bcat, enr)
    batch = {
        (r["subj"], r["pred"], r["obj"])
        for r in build_triples(spark, bcat, enr, tm)
        .where(F.col("pred") != spec.PRED_RELATES)
        .collect()
    }
    streamed = {
        (r["subj"], r["pred"], r["obj"])
        for r in cat.read(spark, "triples_stream").select("subj", "pred", "obj").collect()
    }
    assert streamed == batch and len(streamed) > 0

    # compaction folds the epoch debris without changing the triple set
    assert cat.compact_stream_epochs(spark, "triples_stream")
    after = {
        (r["subj"], r["pred"], r["obj"])
        for r in cat.read(spark, "triples_stream").select("subj", "pred", "obj").collect()
    }
    assert after == batch


def test_streaming_batch_reconciliation_end_to_end(spark, tmp_root):
    """Close the lambda loop (round-6 VERDICT 'Next round' #1): stream epochs
    → batch RELATES reconciliation over the accumulated corpus → the FULL
    three-predicate triple set and the nodes/edges graph tables equal an
    all-batch run (reference semantics:
    knowledge_graph/knowledge_graph.py:118-189). Exercised TWICE — once
    mid-stream and once after more epochs arrive on the same checkpoint — so
    the reconciliation demonstrably converges as the corpus grows, not just
    at the end."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from semantic_search_system_spark import spec
    from semantic_search_system_spark.catalog import Catalog
    from semantic_search_system_spark.plans.pipeline import (
        build_enriched,
        build_graph,
        build_topic_map,
        build_triples,
    )
    from semantic_search_system_spark.streaming.incremental import (
        reconcile_relates,
        serving_triples,
        triples_stream,
    )

    src = os.path.join(tmp_root, "in")
    spark.read.parquet(interleaved_path(SF_SMALL)).repartition(8).write.parquet(src)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    later = os.path.join(tmp_root, "later")
    os.makedirs(later)
    for f in files[4:]:  # second wave arrives after the first reconciliation
        shutil.move(os.path.join(src, f), os.path.join(later, f))

    out = os.path.join(tmp_root, "out")
    ck_t, ck_e = os.path.join(tmp_root, "ckpt_t"), os.path.join(tmp_root, "ckpt_e")
    triples_stream(spark, src, out, ck_t).awaitTermination(180)
    enrich_stream(spark, src, out, ck_e).awaitTermination(180)
    cat = Catalog(out)

    from semantic_search_system_spark.plans.pipeline import (
        mention_topic_triples,
        relates_triples,
    )

    # ---- leg 1: half the corpus streamed, reconcile, compare against an
    # all-batch derivation over the SAME admitted subset
    reconcile_relates(spark, out)
    streamed_ids = {
        r["doc_id"] for r in cat.read(spark, "enriched_stream").select("doc_id").collect()
    }
    bcat1 = Catalog(os.path.join(tmp_root, "batch_half"))
    enr1 = build_enriched(spark, SF_SMALL, bcat1).where(
        F.col("doc_id").isin(list(streamed_ids))
    )
    tm1 = build_topic_map(spark, bcat1, enr1)
    batch1 = {
        (r["subj"], r["pred"], r["obj"])
        for r in mention_topic_triples(enr1)
        .unionByName(relates_triples(enr1, tm1))
        .select("subj", "pred", "obj")
        .collect()
    }
    served1 = {
        (r["subj"], r["pred"], r["obj"]) for r in serving_triples(spark, out).collect()
    }
    assert served1 == batch1 and any(t[1] == spec.PRED_RELATES for t in served1)

    # ---- leg 2: the rest of the corpus arrives on the SAME checkpoints
    for f in files[4:]:
        shutil.move(os.path.join(later, f), os.path.join(src, f))
    triples_stream(spark, src, out, ck_t).awaitTermination(180)
    enrich_stream(spark, src, out, ck_e).awaitTermination(180)
    # compaction between epochs and reconciliation must not perturb the set
    cat.compact_stream_epochs(spark, "triples_stream")
    reconcile_relates(spark, out)

    bcat_full = Catalog(os.path.join(tmp_root, "batch_full"))
    enr_full = build_enriched(spark, SF_SMALL, bcat_full)
    tm_full = build_topic_map(spark, bcat_full, enr_full)
    tr_full = build_triples(spark, bcat_full, enr_full, tm_full)
    batch_full = {
        (r["subj"], r["pred"], r["obj"])
        for r in tr_full.select("subj", "pred", "obj").collect()
    }
    served2 = {
        (r["subj"], r["pred"], r["obj"]) for r in serving_triples(spark, out).collect()
    }
    assert served2 == batch_full and len(served2) > len(served1)

    # ---- the graph tables built from the reconciled view equal the batch ones
    serving = serving_triples(spark, out)
    enr_stream = cat.read(spark, "enriched_stream")
    nodes_s, edges_s = build_graph(spark, cat, enr_stream, serving)
    nodes_b, edges_b = build_graph(spark, bcat_full, enr_full, tr_full)

    def node_set(df):
        return {
            (r["node_id"], r["kind"], r["name"], r["url"], r["title"])
            for r in df.select("node_id", "kind", "name", "url", "title").collect()
        }

    def edge_set(df):
        return {
            (r["src"], r["dst"], r["rel"], r["weight"])
            for r in df.select("src", "dst", "rel", "weight").collect()
        }

    assert node_set(nodes_s) == node_set(nodes_b)
    assert edge_set(edges_s) == edge_set(edges_b)


def test_sessionize_stream_matches_batch(spark, tmp_root):
    """applyInPandasWithState sessionizer: streaming the events table as 4
    time-ordered files (4 micro-batches, cross-batch state) must converge to
    the batch sessionizer's exact per-user session counts."""
    import os
    import time

    from semantic_search_system_spark import entrypoints as ep
    from semantic_search_system_spark.streaming.incremental import sessionize_stream

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").orderBy("ts", "event_id")
    pdf = ev.toPandas()
    src = os.path.join(tmp_root, "events_stream")
    os.makedirs(src)
    quarters = np.array_split(pdf, 4)
    for i, q in enumerate(quarters):  # sequential writes → mtime order = time order
        q.to_parquet(
            os.path.join(src, f"part-{i:04d}.parquet"),
            index=False,
            coerce_timestamps="us",  # Spark's schema expects timestamp(us), not ns
        )
        time.sleep(0.05)

    out_dir = os.path.join(tmp_root, "out")

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessionize_stream(spark, src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp_root, "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    res = spark.read.parquet(out_dir).toPandas()
    # cumulative updates: the final count per user is the max emitted
    streamed = res.groupby("user_id")["n_sessions"].max().to_dict()
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in ep.registry()["sessionize_users"](spark, SF_SMALL).collect()
    }
    assert streamed == batch


def test_windowed_event_metrics_batch_semantics(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    out = windowed_event_metrics(ev)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n"] > 0 for r in rows)
    # sliding 1h/30m windows: every event lands in exactly 2 windows
    assert sum(r["n"] for r in rows) == 2 * ev.count()


def test_decoder_registry_plugin(spark):
    """A registered decoder activates the real-codec path with no code change:
    the registry snapshot rides the mapInPandas closure into the workers, so
    fake=False decodes successfully instead of quarantining."""
    from semantic_search_system_spark.operators.multimodal import (
        _fake_features,
        media_spans,
        register_decoder,
        unregister_decoder,
    )

    def plugin_decoder(media_ref: str) -> bytes:
        # local def → cloudpickle ships it BY VALUE inside the closure (a real
        # deployment would instead make its plugin module importable on
        # executors via --py-files)
        return b"plugin:" + media_ref.encode()

    media = media_spans(spark.read.parquet(interleaved_path(SF_SMALL))).limit(5)
    register_decoder("*", plugin_decoder)
    try:
        rows = extract_media_features(media, fake=False).collect()
    finally:
        unregister_decoder("*")
    assert rows and all(r["decode_ok"] for r in rows)
    r0 = rows[0]
    expect = _fake_features(b"plugin:" + r0["media_ref"].encode(), r0["frame"])
    assert np.allclose(r0["features"], expect)
    # without the plugin, fake=False must quarantine (stub boundary intact)
    bad = extract_media_features(media, fake=False).collect()
    assert bad and not any(r["decode_ok"] for r in bad)


def test_dedup_stream_matches_batch(spark, tmp_root):
    """Continuous dedup as a stream (round 7): (a) the union of per-epoch
    pair tables equals the full-corpus MinHash pair set — every near-dup
    pair lands exactly once, in the epoch of its later member; (b) the
    admission verdicts equal an independent derivation from the full pair
    set + the ACTUAL epoch assignment (history wins, then smaller id within
    an epoch); (c) the signature store accumulates every doc across epochs
    without rewrites."""
    import os

    from pyspark.sql import functions as F

    from semantic_search_system_spark import entrypoints as E
    from semantic_search_system_spark.catalog import Catalog
    from semantic_search_system_spark.operators.dedup import minhash_near_dups
    from semantic_search_system_spark.streaming.incremental import dedup_stream

    corpus = E._dup_corpus(spark, SF_SMALL).localCheckpoint(eager=True)
    pdf = corpus.toPandas()
    base = pdf[~pdf.doc_id.str.startswith("dup_")]
    dups = pdf[pdf.doc_id.str.startswith("dup_")]
    src = os.path.join(tmp_root, "docs_in")
    os.makedirs(src)
    # three files -> three epochs at maxFilesPerTrigger=1; the planted dups
    # arrive last so their pairs are guaranteed cross-epoch
    base.iloc[: len(base) // 2].to_parquet(os.path.join(src, "f0.parquet"), index=False)
    base.iloc[len(base) // 2 :].to_parquet(os.path.join(src, "f1.parquet"), index=False)
    dups.to_parquet(os.path.join(src, "f2.parquet"), index=False)

    out = os.path.join(tmp_root, "out")
    q = dedup_stream(spark, src, out, os.path.join(tmp_root, "ckpt"))
    q.awaitTermination(300)
    cat = Catalog(out)
    epochs = {e["stage"] for e in cat.manifest("minhash_sigs_stream")["snapshots"]}
    assert len(epochs) >= 2, f"expected multiple epochs, got {epochs}"

    streamed_pairs = {
        (r["src"], r["dst"], r["jaccard"])
        for r in cat.read(spark, "dedup_pairs_stream")
        .select("src", "dst", "jaccard").collect()
    }
    full_pairs = {
        (r["src"], r["dst"], r["jaccard"])
        for r in minhash_near_dups(corpus, jaccard_threshold=0.5).collect()
    }
    assert full_pairs and streamed_pairs == full_pairs

    epoch_of = {
        r["doc_id"]: int(r["bucket"].split("_")[0])
        for r in cat.read(spark, "docs_stream").select("doc_id", "bucket").collect()
    }
    assert len(epoch_of) == corpus.count()
    # the premise: at least one pair spans epochs
    assert any(epoch_of[s] != epoch_of[d] for s, d, _ in full_pairs)

    partners: dict[str, set[str]] = {}
    for s, d, _ in full_pairs:
        partners.setdefault(s, set()).add(d)
        partners.setdefault(d, set()).add(s)
    expected = {}
    for doc, e in epoch_of.items():
        blk = [
            p for p in partners.get(doc, ())
            if epoch_of[p] < e or (epoch_of[p] == e and p < doc)
        ]
        expected[doc] = (not blk, min(blk) if blk else None)
    got = {
        r["doc_id"]: (r["admitted"], r["dup_of"])
        for r in cat.read(spark, "admission_stream").collect()
    }
    assert got == expected
    assert cat.read(spark, "minhash_sigs_stream").count() == len(epoch_of)


def test_dedup_stream_resumes_after_compaction(spark, tmp_root):
    """The dedup stream's tables are compaction-compatible: after folding
    the epoch-scoped partitions into canonical c<gen>_<bucket> buckets, a
    resumed stream (same checkpoint) processes a NEW epoch against the
    compacted store — prior-epoch signature reads treat compacted keys as
    history (they carry no current-epoch prefix), pairs against the new
    docs land, and nothing is doubled or lost."""
    import os

    import pandas as pd

    from semantic_search_system_spark import entrypoints as E
    from semantic_search_system_spark.catalog import Catalog
    from semantic_search_system_spark.operators.dedup import minhash_near_dups
    from semantic_search_system_spark.streaming.incremental import dedup_stream

    corpus = E._dup_corpus(spark, SF_SMALL).localCheckpoint(eager=True)
    pdf = corpus.toPandas()
    base = pdf[~pdf.doc_id.str.startswith("dup_")]
    dups = pdf[pdf.doc_id.str.startswith("dup_")]
    src = os.path.join(tmp_root, "docs_in")
    os.makedirs(src)
    base.to_parquet(os.path.join(src, "f0.parquet"), index=False)
    out = os.path.join(tmp_root, "out")
    ckpt = os.path.join(tmp_root, "ckpt")
    dedup_stream(spark, src, out, ckpt).awaitTermination(300)
    cat = Catalog(out)
    n_docs_before = cat.read(spark, "docs_stream").count()
    for tbl in ("docs_stream", "minhash_sigs_stream", "admission_stream"):
        cat.compact_stream_epochs(spark, tbl)
    assert all(
        k.startswith("c") for k in cat.manifest("minhash_sigs_stream")["partitions"]
    )
    # the dup docs arrive AFTER compaction, on the same checkpoint
    dups.to_parquet(os.path.join(src, "f1.parquet"), index=False)
    dedup_stream(spark, src, out, ckpt).awaitTermination(300)
    assert cat.read(spark, "docs_stream").count() == len(pdf)
    assert cat.read(spark, "minhash_sigs_stream").count() == len(pdf)
    assert (
        cat.read(spark, "minhash_sigs_stream").select("doc_id").distinct().count()
        == len(pdf)
    )
    streamed_pairs = {
        (r["src"], r["dst"], r["jaccard"])
        for r in cat.read(spark, "dedup_pairs_stream")
        .select("src", "dst", "jaccard").collect()
    }
    full_pairs = {
        (r["src"], r["dst"], r["jaccard"])
        for r in minhash_near_dups(corpus, jaccard_threshold=0.5).collect()
    }
    assert full_pairs and streamed_pairs == full_pairs
    # every planted dup doc is correctly refused against compacted history
    got = {
        r["doc_id"]: r["admitted"]
        for r in cat.read(spark, "admission_stream").collect()
    }
    assert len(got) == n_docs_before + len(dups)
    exact_dups = {f"dup_{i}" for i in range(50)} & set(dups.doc_id)
    assert exact_dups and not any(got[d] for d in exact_dups)
