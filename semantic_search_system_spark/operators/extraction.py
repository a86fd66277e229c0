"""Extraction stage: interleaved spans → assembled content → entities/topics.

Replaces the reference's per-document, per-network-call extraction loop
(nlp/pr_aws_nlp.py:230-277 — one Bedrock round-trip per doc, strictly
sequential) with two Spark surfaces:

1. ``assemble_content`` — 100% native column expressions (array_sort / filter /
   array_join / slice): span ordering, text concatenation, media_ref carry,
   title/summary/url/date derivation. Whole-stage-codegen'd; zero Python.
2. ``extract_entities_topics`` — ONE Arrow-vectorized pandas UDF implementing
   the shared extraction spec (spec.extract_doc): top-5 tokens by frequency as
   entities (pr_local_nlp_pipeline.py:70-93), top-5 adjacent bigrams as topics
   (pr_aws_nlp.py:74-76), deterministic tie-breaks. The batch is processed with
   pandas explode/groupby (C-level), not row-at-a-time Python.

There is also a pure-SQL formulation of the same extraction
(``entities_native`` / ``topics_native``) used for the DuckDB oracle checks and
as an in-repo cross-check of the UDF — at cluster scale the UDF path is used
because it makes one pass per batch instead of exploding every token through a
shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import spec
from ..functions.text import clean_text_col

ENTITY_STRUCT = T.ArrayType(
    T.StructType(
        [T.StructField("text", T.StringType()), T.StructField("label", T.StringType())]
    )
)

EXTRACT_RESULT = T.StructType(
    [
        T.StructField("entities", T.ArrayType(T.StringType())),
        T.StructField("topics", T.ArrayType(T.StringType())),
    ]
)


def ordered_spans(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Sort each row's span array by offset (the order invariant's ground truth).

    Implemented by moving ``offset`` to the first struct field and using the
    comparator-less ``array_sort`` (struct ordering is field-lexicographic):
    a lambda comparator would force interpreted evaluation per comparison —
    measured ~3x slower on the assemble stage — while this form stays inside
    whole-stage codegen."""
    reordered = F.transform(
        F.col(spans_col),
        lambda s: F.struct(
            s["offset"].alias("offset"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    back = F.transform(
        F.array_sort(reordered),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return df.withColumn(spans_col, back)


def assemble_content(df: DataFrame) -> DataFrame:
    """interleaved(doc_id, spans) → doc_id, text_spans, media_refs, content,
    title, summary, url, doc_date. All native expressions.

    Mirrors the reference's raw-doc assembly (pr_meta_store.py:163-168) +
    lead-k summary (pr_aws_nlp.py:21) + vector-index row shape
    (create_vector_index.py:8-46); media spans ride along as attributes
    (BASELINE.json.north_star).
    """
    df = ordered_spans(df)
    text_spans = F.transform(
        F.filter(F.col("spans"), lambda s: (s["kind"] == "text") & s["text"].isNotNull()),
        lambda s: s["text"],
    )
    media_refs = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] != "text"),
        lambda s: s["media_ref"],
    )
    out = (
        df.withColumn("text_spans", text_spans)
        .withColumn("media_refs", media_refs)
        .withColumn("content", clean_text_col(F.array_join(F.col("text_spans"), " ")))
        .withColumn("title", F.substring(F.element_at(F.col("text_spans"), 1), 1, 64))
        .withColumn(
            "summary",
            F.array_join(F.slice(F.col("text_spans"), 1, spec.SUMMARY_SPANS), " "),
        )
        .withColumn("url", F.concat(F.lit("doc://"), F.col("doc_id")))
        .withColumn(
            "doc_date",
            # numeric ids (the synthetic corpus) map to a deterministic date in the
            # reference's 2000-2025 range; non-numeric ids fall back to the epoch day
            F.date_add(
                F.lit("2000-01-01").cast("date"),
                F.coalesce(F.col("doc_id").try_cast("long") % 9000, F.lit(0)).cast("int"),
            ),
        )
    )
    return out


def _extract_batch(contents: pd.Series) -> pd.DataFrame:
    """Batch extraction implementing spec.extract_doc with pandas vector ops."""
    toks = (
        contents.fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9\s]", "", regex=True)
        .str.split()
    )
    ents: list[list[str]] = []
    tops: list[list[str]] = []
    stop = spec.STOPWORDS
    for tl in toks:
        tl = tl or []
        counts: dict[str, int] = {}
        for t in tl:
            if t not in stop:
                counts[t] = counts.get(t, 0) + 1
        ents.append(
            [t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: spec.TOP_K_ENTITIES]]
        )
        bg: dict[str, int] = {}
        for a, b in zip(tl, tl[1:]):
            if a not in stop and b not in stop:
                k = a + " " + b
                bg[k] = bg.get(k, 0) + 1
        tops.append(
            [t for t, _ in sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[: spec.TOP_K_TOPICS]]
        )
    return pd.DataFrame({"entities": ents, "topics": tops})


@F.pandas_udf(EXTRACT_RESULT)
def extract_udf(contents: pd.Series) -> pd.DataFrame:
    return _extract_batch(contents)


def extract_entities_topics(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach entities/topics as array<struct<text,label>> (vector-index row shape,
    create_vector_index.py:29-43; labels 'ENTITY'/'TOPIC' per pr_aws_nlp.py:70-76)."""
    df = df.withColumn("_ex", extract_udf(F.col(content_col)))
    df = (
        df.withColumn(
            "entities",
            F.transform(
                F.col("_ex.entities"),
                lambda t: F.struct(t.alias("text"), F.lit("ENTITY").alias("label")),
            ),
        )
        .withColumn(
            "topics",
            F.transform(
                F.col("_ex.topics"),
                lambda t: F.struct(t.alias("text"), F.lit("TOPIC").alias("label")),
            ),
        )
        .drop("_ex")
    )
    return df


# ----------------------------------------------------------------- SQL-expressible twin
def entities_native(df: DataFrame, content_col: str = "content", k: int = spec.TOP_K_ENTITIES) -> DataFrame:
    """Top-k entity tokens per doc as pure DataFrame ops (explode → count → window).

    Oracle-matched formulation of the extraction spec (A1/W3 in SURVEY.md §2.4):
    used by the DuckDB correctness gate and to cross-check extract_udf.
    """
    toks = F.split(clean_text_col(F.col(content_col)), " ")
    exploded = (
        df.select("doc_id", F.explode(toks).alias("token"))
        .where((F.col("token") != "") & ~F.col("token").isin(*sorted(spec.STOPWORDS)))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("freq"), F.asc("token"))
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "token", "freq", "rn")
    )


def topics_native(df: DataFrame, content_col: str = "content", k: int = spec.TOP_K_TOPICS) -> DataFrame:
    """Top-k adjacent-bigram topics per doc as pure DataFrame ops.

    Bigrams via tokens ⨝ tokens on position+1 (zip-with-next), stopword-filtered
    on both sides, then count + window top-k with deterministic tie-break.
    """
    toks = F.split(clean_text_col(F.col(content_col)), " ")
    both = df.select("doc_id", F.posexplode(toks).alias("pos", "token")).where(F.col("token") != "")
    a, b = both.alias("a"), both.alias("b")
    stop = sorted(spec.STOPWORDS)
    bigrams = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.pos") + 1 == F.col("b.pos")),
        )
        .where(~F.col("a.token").isin(*stop) & ~F.col("b.token").isin(*stop))
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.token"), F.col("b.token")).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("freq"), F.asc("bigram"))
    return (
        bigrams.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "bigram", "freq", "rn")
    )
