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


def has_usable_text(spans_col: str = "spans"):
    """Validity gate (F6 / §2.11): a doc is processable iff it carries at least
    one non-null, non-blank text span. Rows failing this are routed to the
    Catalog ``failed_rows`` quarantine table instead of being silently dropped
    (the reference keeps a permanent-failure list, pr_aws_nlp.py:296-310)."""
    return F.coalesce(
        F.exists(
            F.col(spans_col),
            lambda s: (s["kind"] == "text")
            & s["text"].isNotNull()
            & (F.trim(s["text"]) != ""),
        ),
        F.lit(False),
    )


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


def _top_k_per_row(items: pd.Series, k: int) -> pd.Series:
    """(row-indexed string Series) → per-row top-k list by (count desc, item asc).

    Vectorized: one groupby-size + one sort + one groupby-head — no per-row
    Python. The sort implements spec.top_k_by_freq's deterministic tie-break."""
    if items.empty:
        return pd.Series(dtype=object)
    cnt = items.groupby([items.index, items]).size()
    df = cnt.rename("c").reset_index()
    df.columns = ["row", "item", "c"]
    df = df.sort_values(["row", "c", "item"], ascending=[True, False, True], kind="mergesort")
    top = df.groupby("row", sort=False).head(k)
    return top.groupby("row", sort=False)["item"].agg(list)


def tokenize_batch(contents: pd.Series) -> pd.Series:
    """The spec's batch tokenization (lower → strip non-alnum → split),
    row-reindexed — shared by extraction and embedding so the fused enrich
    UDF tokenizes each content string exactly once."""
    toks = (
        contents.fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9\s]", "", regex=True)
        .str.split()
    )
    return toks.reset_index(drop=True)


def _extract_batch(contents: pd.Series, toks: pd.Series | None = None) -> pd.DataFrame:
    """Batch extraction implementing spec.extract_doc with pandas vector ops
    (explode + groupby run in C; zero per-row Python on the hot path)."""
    if toks is None:
        toks = tokenize_batch(contents)
    tok = toks.explode()
    tok = tok[tok.notna() & (tok != "")]
    stop = sorted(spec.STOPWORDS)

    ents_by_row = _top_k_per_row(tok[~tok.isin(stop)], spec.TOP_K_ENTITIES)

    nxt = tok.groupby(level=0).shift(-1)
    mask = nxt.notna() & ~tok.isin(stop) & ~nxt.isin(stop)
    bigrams = tok[mask] + " " + nxt[mask]
    tops_by_row = _top_k_per_row(bigrams, spec.TOP_K_TOPICS)

    n = len(contents)
    empty: list[str] = []
    return pd.DataFrame(
        {
            "entities": [ents_by_row.get(i, empty) for i in range(n)],
            "topics": [tops_by_row.get(i, empty) for i in range(n)],
        }
    )


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
