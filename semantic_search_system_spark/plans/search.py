"""The five search strategies (SURVEY.md §2.10) as declarative DataFrame queries
over the enriched table, each with a DuckDB-SQL twin generated from the SAME
constants so the oracle comparison is exact.

Reference parity (utils/search_service.py):
- simple_search        (:16-89)   fuzzy match on nested topics/entities texts,
                                   date filter, min_should_match=1, top-k
- advanced_search      (:92-124)  multi_match title^3/summary^2 + kNN(k*3)
- pro_search           (:127-226) hybrid lexical(min_should=2) + semantic
                                   kNN(max(5k,50)); min-max fusion + mean
                                   (constants.py:13-23)
- pro_search_enhanced  (:228-297) + query expansion (original x1.0, expansion
                                   x0.5, :263-271), rerank window k*5, rerank
- search_kb            (:299-390) + thresholds: normalized score >= 70
                                   (:380-382), semantic_k <= 10 (:329-330)

Scoring is deterministic end-to-end: every score is rounded to 6dp BEFORE any
rank/limit, and every ordering carries a doc_id tiebreak, so Spark and DuckDB
select identical result sets. The LLM calls of the reference (expansion,
rerank) are replaced by deterministic analogs per SURVEY §2.9 N11-N12:
expansion = top-3 corpus-frequent entity tokens, rerank = weighted
token-overlap + cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import spec

# Fixed benchmark query — vocabulary of the synthetic corpus.
QUERY_TEXT = "spark join table"
K = 10
FUZZINESS = 1
DATE_LO, DATE_HI = "2000-01-01", "2020-01-01"

QUERY_TERMS = spec.clean_tokens(QUERY_TEXT)
QUERY_VEC = [float(x) for x in spec.embed_text(QUERY_TEXT)]

_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + "]"
_QVEC_SQL = "CAST([" + ", ".join(repr(x) for x in QUERY_VEC) + "] AS DOUBLE[])"


def _terms_arr():
    return F.array(*[F.lit(t) for t in QUERY_TERMS])


def _qvec_arr():
    return F.array(*[F.lit(x) for x in QUERY_VEC])


# --------------------------------------------------------------- shared scoring
def _with_scores(enriched: DataFrame) -> DataFrame:
    """Attach all rounded score components used by the strategies."""
    emb = F.col("embedding").cast("array<double>")
    qv = _qvec_arr()
    dot = F.aggregate(F.zip_with(emb, qv, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v)
    nrm = F.sqrt(F.aggregate(emb, F.lit(0.0), lambda s, v: s + v * v))
    qnrm = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda s, v: s + v * v))
    cos = F.round(dot / (nrm * qnrm), 6)

    terms = _terms_arr()
    title_toks = F.split(F.lower(F.col("title")), " ")
    summary_toks = F.split(F.lower(F.col("summary")), " ")
    content_toks = F.split(F.col("content"), " ")
    ent_texts = F.transform("entities", lambda e: e["text"])
    topic_texts = F.transform("topics", lambda t: t["text"])

    def overlap(toks):
        return F.size(F.array_intersect(toks, terms)).cast("double")

    # fuzzy hit count over entity+topic texts (levenshtein <= FUZZINESS to any term)
    et = F.concat(ent_texts, topic_texts)
    fuzzy_hits = F.size(
        F.filter(
            et,
            lambda x: F.exists(terms, lambda t: F.levenshtein(x, t) <= F.lit(FUZZINESS)),
        )
    ).cast("double")

    return (
        enriched.withColumn("sem_score", cos)
        .withColumn("title_ov", overlap(title_toks))
        .withColumn("summary_ov", overlap(summary_toks))
        .withColumn("content_ov", overlap(content_toks))
        .withColumn("ent_ov", F.size(F.array_intersect(ent_texts, terms)).cast("double"))
        .withColumn("topic_ov", F.size(F.array_intersect(topic_texts, terms)).cast("double"))
        .withColumn("fuzzy_hits", fuzzy_hits)
    )


_SCORES_CTE = f"""
  scored AS (
    SELECT *,
      round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), {_QVEC_SQL}), 6) AS sem_score,
      CAST(len(list_intersect(string_split(lower(title), ' '), {_TERMS_SQL})) AS DOUBLE) AS title_ov,
      CAST(len(list_intersect(string_split(lower(summary), ' '), {_TERMS_SQL})) AS DOUBLE) AS summary_ov,
      CAST(len(list_intersect(string_split(content, ' '), {_TERMS_SQL})) AS DOUBLE) AS content_ov,
      CAST(len(list_intersect(list_transform(entities, e -> e.text), {_TERMS_SQL})) AS DOUBLE) AS ent_ov,
      CAST(len(list_intersect(list_transform(topics, t -> t.text), {_TERMS_SQL})) AS DOUBLE) AS topic_ov,
      CAST(len(list_filter(list_transform(entities, e -> e.text) || list_transform(topics, t -> t.text),
               x -> len(list_filter({_TERMS_SQL}, t -> levenshtein(x, t) <= {FUZZINESS})) > 0)) AS DOUBLE) AS fuzzy_hits
    FROM docs
  )
"""


def _docs_cte(enriched_glob: str) -> str:
    return f"WITH docs AS (SELECT * FROM read_parquet('{enriched_glob}')),\n{_SCORES_CTE}"


# ================================================================ Q1 simple
def simple_search(enriched: DataFrame, k: int = K) -> DataFrame:
    s = _with_scores(enriched)
    return (
        s.where(
            (F.col("doc_date") >= F.lit(DATE_LO).cast("date"))
            & (F.col("doc_date") < F.lit(DATE_HI).cast("date"))
            & (F.col("fuzzy_hits") >= 1)  # minimum_should_match=1
        )
        .select("doc_id", F.col("fuzzy_hits").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def simple_search_sql(enriched_glob: str, k: int = K) -> str:
    return f"""
    {_docs_cte(enriched_glob)}
    SELECT doc_id, fuzzy_hits AS score FROM scored
    WHERE doc_date >= DATE '{DATE_LO}' AND doc_date < DATE '{DATE_HI}' AND fuzzy_hits >= 1
    ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


# ---------------------------------------------------------------- scale helpers
def _semantic_topk_flag(s: DataFrame, semantic_k: int, flag: str) -> DataFrame:
    """Mark the semantic top-k rows WITHOUT a global window: a global
    ``row_number()`` (WindowExec with no partition) funnels every row through
    one task; ``orderBy().limit()`` compiles to TakeOrderedAndProject (partial
    top-k on every partition, merge on the driver) and the tiny result is
    broadcast-joined back. The (sem_score desc, doc_id asc) ordering is total,
    so the selected set is identical to the rank formulation."""
    topk = (
        s.orderBy(F.desc("sem_score"), F.asc("doc_id"))
        .limit(semantic_k)
        .select("doc_id", F.lit(True).alias(flag))
    )
    return s.join(F.broadcast(topk), "doc_id", "left").withColumn(
        flag, F.coalesce(F.col(flag), F.lit(False))
    )


# ================================================================ Q2 advanced
def advanced_search(enriched: DataFrame, k: int = K) -> DataFrame:
    s = _semantic_topk_flag(_with_scores(enriched), k * 3, "_sem_top")
    score = F.round(
        F.col("title_ov") * 3.0
        + F.col("summary_ov") * 2.0
        + F.when(F.col("_sem_top"), F.col("sem_score")).otherwise(0.0),
        6,
    )
    return (
        s.withColumn("score", score)
        .where(F.col("score") > 0)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def advanced_search_sql(enriched_glob: str, k: int = K) -> str:
    return f"""
    {_docs_cte(enriched_glob)},
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY sem_score DESC, doc_id ASC) AS sem_rank FROM scored)
    SELECT doc_id, score FROM (
      SELECT doc_id,
             round(title_ov * 3.0 + summary_ov * 2.0 +
                   CASE WHEN sem_rank <= {k * 3} THEN sem_score ELSE 0.0 END, 6) AS score
      FROM ranked)
    WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


# ================================================================ Q3 pro (hybrid fusion)
def _hybrid(enriched: DataFrame, k: int, semantic_k: int) -> DataFrame:
    """Candidates = lexical(min_should_match=2) ∪ semantic top-semantic_k;
    per-branch min-max to [0,1] over candidates, arithmetic-mean fusion."""
    s = _with_scores(enriched)
    lex = F.round(
        F.col("summary_ov") * 2.0
        + F.col("content_ov") * 3.0
        + F.col("ent_ov") * 1.5
        + F.col("topic_ov") * 1.5,
        6,
    )
    should = (
        (F.col("summary_ov") > 0).cast("int")
        + (F.col("content_ov") > 0).cast("int")
        + (F.col("ent_ov") > 0).cast("int")
        + (F.col("topic_ov") > 0).cast("int")
    )
    s = s.withColumn("lex_score", lex).withColumn("lex_ok", should >= 2)
    s = _semantic_topk_flag(s, semantic_k, "_sem_top")
    cand = s.where(F.col("lex_ok") | F.col("_sem_top"))
    cand = cand.withColumn("lex_b", F.when(F.col("lex_ok"), F.col("lex_score")).otherwise(0.0))
    cand = cand.withColumn("sem_b", F.when(F.col("_sem_top"), F.col("sem_score")).otherwise(0.0))
    # branch min/max as ONE aggregate broadcast back — a partition-less window
    # would single-task the whole candidate set at scale
    stats = cand.agg(
        F.min("lex_b").alias("_lmn"), F.max("lex_b").alias("_lmx"),
        F.min("sem_b").alias("_smn"), F.max("sem_b").alias("_smx"),
    )
    cand = cand.crossJoin(F.broadcast(stats))

    def norm(c, mn, mx):
        return F.round(
            F.when(F.col(mx) == F.col(mn), F.lit(1.0)).otherwise(
                (F.col(c) - F.col(mn)) / (F.col(mx) - F.col(mn))
            ),
            6,
        )

    cand = cand.withColumn("lex_n", norm("lex_b", "_lmn", "_lmx")).withColumn(
        "sem_n", norm("sem_b", "_smn", "_smx")
    )
    return cand.withColumn("score", F.round((F.col("lex_n") + F.col("sem_n")) / 2.0, 6))


def pro_search(enriched: DataFrame, k: int = K) -> DataFrame:
    semantic_k = max(5 * k, 50)
    return (
        _hybrid(enriched, k, semantic_k)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _hybrid_sql(enriched_glob: str, semantic_k: int) -> str:
    return f"""
    {_docs_cte(enriched_glob)},
    ranked AS (
      SELECT *,
        round(summary_ov * 2.0 + content_ov * 3.0 + ent_ov * 1.5 + topic_ov * 1.5, 6) AS lex_score,
        (CAST(summary_ov > 0 AS INT) + CAST(content_ov > 0 AS INT) +
         CAST(ent_ov > 0 AS INT) + CAST(topic_ov > 0 AS INT)) >= 2 AS lex_ok,
        row_number() OVER (ORDER BY sem_score DESC, doc_id ASC) AS sem_rank
      FROM scored),
    cand AS (
      SELECT *,
        CASE WHEN lex_ok THEN lex_score ELSE 0.0 END AS lex_b,
        CASE WHEN sem_rank <= {semantic_k} THEN sem_score ELSE 0.0 END AS sem_b
      FROM ranked WHERE lex_ok OR sem_rank <= {semantic_k}),
    normed AS (
      SELECT *,
        round(CASE WHEN max(lex_b) OVER () = min(lex_b) OVER () THEN 1.0
              ELSE (lex_b - min(lex_b) OVER ()) / (max(lex_b) OVER () - min(lex_b) OVER ()) END, 6) AS lex_n,
        round(CASE WHEN max(sem_b) OVER () = min(sem_b) OVER () THEN 1.0
              ELSE (sem_b - min(sem_b) OVER ()) / (max(sem_b) OVER () - min(sem_b) OVER ()) END, 6) AS sem_n
      FROM cand),
    fused AS (SELECT *, round((lex_n + sem_n) / 2.0, 6) AS score FROM normed)
    """


def pro_search_sql(enriched_glob: str, k: int = K) -> str:
    semantic_k = max(5 * k, 50)
    return f"""
    {_hybrid_sql(enriched_glob, semantic_k)}
    SELECT doc_id, score FROM fused ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


# ================================================================ Q4 enhanced
def _expansion_terms(enriched: DataFrame) -> DataFrame:
    """Deterministic query expansion (N11): the top-3 corpus-frequent entity
    tokens not already in the query (original x1.0 / expansion x0.5 boosts,
    search_service.py:263-271)."""
    return (
        enriched.select(F.explode(F.transform("entities", lambda e: e["text"])).alias("term"))
        .where(~F.col("term").isin(*QUERY_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(3)
    )


def pro_search_enhanced(enriched: DataFrame, k: int = K) -> DataFrame:
    semantic_k = max(5 * k, 50)
    fused = _hybrid(enriched, k, semantic_k)
    exp = _expansion_terms(enriched).select(F.collect_list("term").alias("exp_terms"))
    fused = fused.crossJoin(F.broadcast(exp))
    exp_ov = F.size(
        F.array_intersect(F.split(F.col("content"), " "), F.col("exp_terms"))
    ).cast("double")
    boosted = F.round(F.col("score") * 1.0 + exp_ov * 0.5, 6)
    # rerank window selection via TakeOrderedAndProject, not a global window
    window = (
        fused.withColumn("boosted", boosted)
        .orderBy(F.desc("boosted"), F.asc("doc_id"))
        .limit(k * 5)
    )
    # rerank (N12): weighted overlap + cosine over the k*5 window
    qn = float(len(QUERY_TERMS))
    rerank = F.round(
        0.6 * (F.size(F.array_intersect(F.split(F.col("content"), " "), _terms_arr())) / F.lit(qn))
        + 0.4 * F.col("sem_score"),
        6,
    )
    return (
        window.withColumn("rerank_score", rerank)
        .select("doc_id", F.col("rerank_score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def pro_search_enhanced_sql(enriched_glob: str, k: int = K) -> str:
    semantic_k = max(5 * k, 50)
    qn = float(len(QUERY_TERMS))
    return f"""
    {_hybrid_sql(enriched_glob, semantic_k)},
    exp AS (
      SELECT list(term ORDER BY n DESC, term ASC) AS exp_terms FROM (
        SELECT term, count(*) AS n FROM (
          SELECT unnest(list_transform(entities, e -> e.text)) AS term FROM docs)
        WHERE term NOT IN (SELECT unnest({_TERMS_SQL}))
        GROUP BY term ORDER BY n DESC, term ASC LIMIT 3)),
    boosted AS (
      SELECT f.*, round(f.score * 1.0 +
             CAST(len(list_intersect(string_split(f.content, ' '), e.exp_terms)) AS DOUBLE) * 0.5, 6) AS boosted
      FROM fused f, exp e),
    windowed AS (
      SELECT *, row_number() OVER (ORDER BY boosted DESC, doc_id ASC) AS rr FROM boosted)
    SELECT doc_id,
           round(0.6 * (CAST(len(list_intersect(string_split(content, ' '), {_TERMS_SQL})) AS DOUBLE) / {qn})
                 + 0.4 * sem_score, 6) AS score
    FROM windowed WHERE rr <= {k * 5}
    ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


# ================================================================ Q5 search_kb
def search_kb(enriched: DataFrame, k: int = K) -> DataFrame:
    semantic_k = min(max(1, k), 10)  # capped (search_service.py:329-330)
    fused = _hybrid(enriched, k, semantic_k)
    # normalize fused score to [1,100], threshold >= 70 (search_service.py:380-382)
    stats = fused.agg(F.min("score").alias("_mn"), F.max("score").alias("_mx"))
    fused = fused.crossJoin(F.broadcast(stats))
    mn, mx = F.col("_mn"), F.col("_mx")
    norm100 = F.round(
        F.when(mx == mn, F.lit(100.0)).otherwise(
            F.greatest(F.lit(1.0), F.least(F.lit(100.0), 1.0 + (F.col("score") - mn) / (mx - mn) * 99.0))
        ),
        6,
    )
    return (
        fused.withColumn("norm_score", norm100)
        .where(F.col("norm_score") >= 70.0)
        .select("doc_id", F.col("norm_score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_kb_sql(enriched_glob: str, k: int = K) -> str:
    semantic_k = min(max(1, k), 10)
    return f"""
    {_hybrid_sql(enriched_glob, semantic_k)},
    n100 AS (
      SELECT *, round(CASE WHEN max(score) OVER () = min(score) OVER () THEN 100.0
             ELSE greatest(1.0, least(100.0,
                  1.0 + (score - min(score) OVER ()) / (max(score) OVER () - min(score) OVER ()) * 99.0)) END, 6) AS norm_score
      FROM fused)
    SELECT doc_id, norm_score AS score FROM n100
    WHERE norm_score >= 70.0 ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


def ensure_enriched_for_search(spark: SparkSession, sf_dir: str, out_root: str) -> DataFrame:
    from .pipeline import ensure_enriched

    return ensure_enriched(spark, sf_dir, out_root)
