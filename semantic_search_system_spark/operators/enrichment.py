"""Fused enrichment UDF: entities + topics + embedding in ONE Arrow stage.

``extract_udf`` and ``embed_udf`` are kept as standalone operators, but the
pipeline uses this fused form on the hot path: both extractors tokenize the
same cleaned content, so fusing them halves the Python-side tokenization AND
halves the Arrow serialization of the content column (one batch transfer
instead of two). At 10^12 docs the enrichment stage is the dominant compute —
this is the single biggest constant-factor lever.

Must stay spec-exact: delegates to the same batch kernels the standalone
operators use (operators/extraction._extract_batch, operators/embedding
embed_batch), so the UDF==native==golden cross-checks keep holding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .embedding import embed_batch
from .extraction import _extract_batch, build_token_stream

ENRICH_RESULT = T.StructType(
    [
        T.StructField("entities", T.ArrayType(T.StringType())),
        T.StructField("topics", T.ArrayType(T.StringType())),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@F.pandas_udf(ENRICH_RESULT)
def enrich_udf(contents: pd.Series) -> pd.DataFrame:
    # Contents are PRE-CLEANED (enrich_content contract): clean_text_col ran
    # JVM-side during assembly and the spec cleaner is idempotent, so the two
    # Python regex passes of tokenize_batch would only stream the whole
    # content column through two more string copies — split on whitespace is
    # the entire remaining tokenizer. (The standalone extract_udf/embed_udf
    # keep the full cleaner for arbitrary input.)
    toks = contents.fillna("").str.split().reset_index(drop=True)
    ts = build_token_stream(toks)  # once — extract and embed share the stream
    out = _extract_batch(contents, ts=ts)
    out["embedding"] = embed_batch(contents, ts=ts)
    return out


def enrich_content(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach entities/topics (array<struct<text,label>>) + embedding via the
    fused UDF — output-identical to extract_entities_topics ∘ with_embedding.

    CONTRACT: ``content_col`` must already be spec-clean (the
    ``clean_text_col`` output that assemble_content produces) — the fused UDF
    skips the redundant Python-side re-clean."""
    df = df.withColumn("_en", enrich_udf(F.col(content_col)))
    return (
        df.withColumn(
            "entities",
            F.transform(
                F.col("_en.entities"),
                lambda t: F.struct(t.alias("text"), F.lit("ENTITY").alias("label")),
            ),
        )
        .withColumn(
            "topics",
            F.transform(
                F.col("_en.topics"),
                lambda t: F.struct(t.alias("text"), F.lit("TOPIC").alias("label")),
            ),
        )
        .withColumn("embedding", F.col("_en.embedding"))
        .drop("_en")
    )
