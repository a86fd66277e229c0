"""Query registry: every SURVEY.md §2 operator as a (Spark DataFrame query,
DuckDB oracle SQL) pair, keyed by a stable name.

This backs the driver contract in ``__spark_entry__.py``: each Spark callable
takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle string is ANSI
SQL DuckDB runs over the same parquet (testdata tables pre-registered as views;
repo-generated tables — the interleaved corpus, pipeline outputs — addressed
with ``read_parquet`` absolute paths at sf0.01, the scale the driver checks).

Conventions that make the driver's order-insensitive value-hash comparison
deterministic across engines:
- every computed column is aliased identically on both sides;
- floating aggregates are ``round(x, N)``-ed on both sides (engines sum in
  different orders; exact doubles would never hash-match);
- list outputs are flattened to sorted comma-joined strings;
- ties in top-k windows are broken by a deterministic second key.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import spec
from .fixtures.interleave import interleaved_path
from .functions.text import clean_text_col
from .functions.vectors import dot, l2_norm
from .operators.extraction import entities_native, topics_native

# sf the driver's oracle runs at — repo-generated parquet paths in oracle SQL
# are pinned to this scale.
ORACLE_SF_DIR = "/root/testdata/sf0.01"
ORACLE_INTERLEAVED = "/root/repo/data/interleaved/sf0.01/documents_interleaved.parquet"


def out_root(sf_dir: str) -> str:
    """Catalog root for pipeline outputs of one sf, versioned by the spec so a
    spec change invalidates cached tables."""
    sf = os.path.basename(os.path.normpath(sf_dir))
    return f"/root/repo/data/out/v{spec.SPEC_VERSION}/{sf}"


ORACLE_ENRICHED_GLOB = f"{out_root(ORACLE_SF_DIR)}/enriched/bucket=*/*.parquet"

_STOP_SQL = ", ".join(f"''{s}''" for s in sorted(spec.STOPWORDS)).replace("''", "'")

QueryFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def registry() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


# =====================================================================
# Relational operators (SURVEY.md §2.2-2.7) over the TPC-H-ish tables
# =====================================================================


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3/A7: grouped multi-aggregate with filter pushdown (TPC-H Q1 shape)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F5/F7: predicate + projection, both pushed to the parquet scan."""
    return (
        load(spark, sf_dir, "orders")
        .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@query(
    "date_range_scan",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-05'
    """,
)
def date_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: date-range predicate (build_date_filter, search_pipeline.py:153-166)."""
    ev = load(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= F.lit("2024-01-03").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
    ).select("event_id", "user_id", "event_type")


@query(
    "join_customer_region",
    oracle="""
    SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3: star-schema equi-join chain; both dims broadcast (SURVEY §2.3)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
    )


@query(
    "top_parts_per_supplier",
    oracle="""
    SELECT l_suppkey, l_partkey, qty, rn FROM (
      SELECT l_suppkey, l_partkey, round(sum(l_quantity), 2) AS qty,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY round(sum(l_quantity), 2) DESC, l_partkey ASC) AS rn
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ) WHERE rn <= 5
    """,
)
def top_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/W3: top-k per group via window (reference top-5 entities pattern,
    pr_local_nlp_pipeline.py:70-93)."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_suppkey", "l_partkey").agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("qty"), F.asc("l_partkey"))
    return agg.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5)


@query(
    "minmax_normalize_orders",
    oracle="""
    SELECT o_orderkey,
           round(CASE WHEN mx = mn THEN 100.0
                 ELSE greatest(1.0, least(100.0, 1.0 + (o_totalprice - mn) / (mx - mn) * 99.0))
                 END, 6) AS norm_score
    FROM (SELECT o_orderkey, o_totalprice,
                 min(o_totalprice) OVER () AS mn, max(o_totalprice) OVER () AS mx
          FROM orders)
    """,
)
def minmax_normalize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: min-max normalization to [1,100] incl. constant-score edge case
    (normalize_scores_to_100, search_pipeline.py:34-64)."""
    from .functions.scoring import minmax_normalize_100

    o = load(spark, sf_dir, "orders")
    out = minmax_normalize_100(o, "o_totalprice")
    return out.select("o_orderkey", F.round("norm_score", 6).alias("norm_score"))


@query(
    "union_distinct_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
      UNION
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY o_orderpriority
    """,
)
def union_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union + distinct (pr_meta_fetch.py:76-81 link accumulation)."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderpriority")
    b = o.where(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderpriority")
    return a.union(b).distinct().groupBy("o_orderpriority").agg(F.count("*").alias("n"))


@query(
    "semi_anti_customers",
    oracle="""
    SELECT 'with_orders' AS cohort, count(*) AS n FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS cohort, count(*) AS n FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J4/U2: left_semi (EXISTS) + left_anti (NOT EXISTS) cohorts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    semi = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").agg(
        F.count("*").alias("n")
    ).select(F.lit("with_orders").alias("cohort"), "n")
    anti = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").agg(
        F.count("*").alias("n")
    ).select(F.lit("without_orders").alias("cohort"), "n")
    return semi.unionByName(anti)


@query(
    "suppliers_per_nation",
    oracle="""
    SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers, count(*) AS n
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/O5: group-to-list with deterministic sort (collect_list + array_sort),
    flattened to a string so both engines hash identically."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count("*").alias("n"),
        )
    )


@query(
    "nation_revenue_rank",
    oracle="""
    SELECT n_name, revenue, rank() OVER (ORDER BY revenue DESC, n_name ASC) AS rnk FROM (
      SELECT n_name, round(sum(o_totalprice), 2) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    """,
)
def nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: rank over aggregated join (result sorting, main_app.py:150-164)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    return rev.withColumn(
        "rnk", F.rank().over(Window.orderBy(F.desc("revenue"), F.asc("n_name")))
    )


@query(
    "max_order_key",
    oracle="SELECT max(o_orderkey) AS max_id FROM orders",
)
def max_order_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/O4: max-id scan (the auto-increment scan, pr_meta_store_from_local.py:22-37)."""
    return load(spark, sf_dir, "orders").agg(F.max("o_orderkey").alias("max_id"))


@query(
    "events_monthly_metrics",
    oracle="""
    SELECT cast(date_trunc('month', ts) AS DATE) AS month, event_type, count(*) AS n,
           round(sum(value), 2) AS total_value,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
    FROM events GROUP BY 1, 2
    """,
)
def events_monthly_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/§2.11: per-(month, type) telemetry rollup — the per-partition metrics
    pattern (pr_aws_nlp.py:226-283 processed/failed counters)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date(F.date_trunc("month", F.col("ts"))).alias("month"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
    )


@query(
    "sessionize_users",
    oracle="""
    SELECT user_id, cast(sum(brk) + 1 AS BIGINT) AS n_sessions FROM (
      SELECT user_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ) GROUP BY user_id
    """,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min (guide 'Common OLAP patterns'); window + agg."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    brk = F.when(gap > 1800, 1).otherwise(0)
    return (
        ev.withColumn("brk", brk)
        .groupBy("user_id")
        .agg((F.sum("brk") + 1).cast("long").alias("n_sessions"))
    )


@query(
    "fuzzy_nation_pairs",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_name < b.n_name
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    """,
)
def fuzzy_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15: fuzzy match via edit distance (fuzziness params, search_service.py:16-124)."""
    n = load(spark, sf_dir, "nation").select("n_name")
    a, b = n.alias("a"), n.alias("b")
    pairs = a.join(b, F.col("a.n_name") < F.col("b.n_name"))
    return (
        pairs.select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            F.levenshtein(F.col("a.n_name"), F.col("b.n_name")).alias("dist"),
        )
        .where(F.col("dist") <= 2)
    )


# =====================================================================
# Vector operators (J7/A4/C11) over the embeddings table
# =====================================================================


@query(
    "knn_cosine_top10",
    oracle="""
    SELECT e.vec_id,
           round(list_cosine_similarity(cast(e.embedding AS DOUBLE[]), cast(q.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY sim DESC, e.vec_id ASC LIMIT 10
    """,
)
def knn_cosine_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/O1: brute-force cosine top-k — the exact-kNN baseline replacing the
    reference's OpenSearch HNSW call (search_service.py:117)."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    cos = dot("embedding", "qvec") / (l2_norm("embedding") * l2_norm("qvec"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(cos, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "centroid_per_label",
    oracle="""
    SELECT label, i - 1 AS dim, round(avg(embedding[i]), 6) AS centroid_val
    FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings)
    GROUP BY label, i
    """,
)
def centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: vector centroid per cluster (np.mean, topic_modeling.py:56) as
    posexplode + grouped avg — fully distributed, no driver collect."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg("v"), 6).alias("centroid_val"))
    )


# =====================================================================
# Text analytics (N-ops, C-ops, dedup family) over documents
# =====================================================================


@query(
    "clean_tokenize_docs",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS content,
           len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS n_tokens
    FROM documents
    """,
)
def clean_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C3: clean_text (pr_meta_store.py:26-29) + token count, all native."""
    d = load(spark, sf_dir, "documents")
    content = clean_text_col(F.col("text"))
    return d.select(
        "doc_id",
        content.alias("content"),
        F.size(F.split(content, " ")).alias("n_tokens"),
    )


@query(
    "top5_entities_per_doc",
    oracle=f"""
    SELECT doc_id, token, freq, rn FROM (
      SELECT doc_id, token, freq,
             row_number() OVER (PARTITION BY doc_id ORDER BY freq DESC, token ASC) AS rn
      FROM (
        SELECT doc_id, token, count(*) AS freq FROM (
          SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS token
          FROM documents)
        WHERE token <> '' AND token NOT IN ({_STOP_SQL})
        GROUP BY doc_id, token)
    ) WHERE rn <= 5
    """,
)
def top5_entities_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N4/A1: the extraction spec's entity operator, SQL-expressible twin
    (cross-checks the pandas UDF; tests assert UDF == native)."""
    d = load(spark, sf_dir, "documents").select("doc_id", F.col("text").alias("content"))
    return entities_native(d)


@query(
    "top5_topics_per_doc",
    oracle=f"""
    SELECT doc_id, bigram, freq, rn FROM (
      SELECT doc_id, bigram, freq,
             row_number() OVER (PARTITION BY doc_id ORDER BY freq DESC, bigram ASC) AS rn
      FROM (
        SELECT doc_id, bigram, count(*) AS freq FROM (
          SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
          FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-1)) AS i
                FROM (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ') AS toks
                      FROM documents))
          WHERE toks[i] NOT IN ({_STOP_SQL}) AND toks[i+1] NOT IN ({_STOP_SQL})
                AND toks[i] <> '' AND toks[i+1] <> '')
        GROUP BY doc_id, bigram)
    ) WHERE rn <= 5
    """,
)
def top5_topics_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: the bigram-topic operator, SQL-expressible twin."""
    d = load(spark, sf_dir, "documents").select("doc_id", F.col("text").alias("content"))
    return topics_native(d)


@query(
    "doc_triples_sql",
    oracle=f"""
    SELECT cast(doc_id AS VARCHAR) AS subj, 'MENTIONS' AS pred, token AS obj FROM (
      SELECT doc_id, token,
             row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, token ASC) AS rn
      FROM (
        SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS token
        FROM documents)
      WHERE token <> '' AND token NOT IN ({_STOP_SQL})
      GROUP BY doc_id, token
    ) WHERE rn <= 5
    """,
)
def doc_triples_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc, MENTIONS, entity) triple emission in pure SQL form — puts the
    triple gate itself under the DuckDB oracle (SURVEY §1.3 triple shape)."""
    d = load(spark, sf_dir, "documents").select("doc_id", F.col("text").alias("content"))
    return entities_native(d).select(
        F.col("doc_id").cast("string").alias("subj"),
        F.lit(spec.PRED_MENTIONS).alias("pred"),
        F.col("token").alias("obj"),
    )


@query(
    "doc_quality_scores",
    oracle=f"""
    SELECT doc_id, n_tokens, n_stop,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len
    FROM (
      SELECT doc_id, max(n_chars) AS n_chars, count(*) AS n_tokens,
             sum(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END) AS n_stop
      FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id)
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality scoring (training-data pipeline op): token count, stopword
    ratio, average token length — all native expressions."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in sorted(spec.STOPWORDS)])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stop"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / n_tokens, 6).alias("avg_token_len"),
    )


@query(
    "lang_id_heuristic",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred,
           lang AS lang_actual
    FROM (
      SELECT doc_id, max(lang) AS lang, count(*) AS n_tokens,
             sum(CASE WHEN token IN ({_STOP_SQL}) THEN 1 ELSE 0 END) AS n_stop
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id)
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-density n-gram stand-in) — training-data op."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in sorted(spec.STOPWORDS)])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double") / F.size(toks)
    return d.select(
        "doc_id",
        F.when(ratio >= 0.05, "en").otherwise("unknown").alias("lang_pred"),
        F.col("lang").alias("lang_actual"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, md5(substring(text, 1, 100)) AS fp FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: md5-of-prefix document fingerprint (app.py:215 md5(text[:100]))."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.substring(F.col("text"), 1, 100)).alias("fp")
    )


@query(
    "exact_dup_groups",
    oracle="""
    SELECT fp, count(*) AS n, min(doc_id) AS keeper FROM
      (SELECT doc_id, md5(lower(text)) AS fp FROM documents)
    GROUP BY fp
    """,
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy — keeper = min doc_id per group."""
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.lower(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
    )


# =====================================================================
# Interleaved-corpus operators (the input_hint table; M1 invariants)
# =====================================================================


@query(
    "spans_kind_counts",
    oracle=f"""
    SELECT doc_id, s.kind AS kind, count(*) AS n
    FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{ORACLE_INTERLEAVED}'))
    GROUP BY doc_id, kind
    """,
)
def spans_kind_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/M1: explode the interleaved spans, count per kind per doc."""
    df = spark.read.parquet(interleaved_path(sf_dir))
    return (
        df.select("doc_id", F.explode("spans").alias("s"))
        .groupBy("doc_id", F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "span_sequence_invariant",
    oracle=f"""
    SELECT count(*) AS violations FROM (
      SELECT doc_id, unnest(generate_series(1, len(spans))) AS i, spans
      FROM read_parquet('{ORACLE_INTERLEAVED}')
    ) WHERE spans[i].offset != i - 1
    """,
)
def span_sequence_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row span-sequence invariant (BASELINE.json.input_hint): offsets
    are exactly the stored order 0..n-1. Expect one row {violations: 0}."""
    df = spark.read.parquet(interleaved_path(sf_dir))
    bad = F.exists(
        F.zip_with(
            F.col("spans"),
            F.sequence(F.lit(0), F.size("spans") - 1),
            lambda s, i: s["offset"] != i,
        ),
        lambda x: x,
    )
    return df.select(F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("violations"))


@query(
    "media_ref_integrity",
    oracle=f"""
    SELECT count(*) AS bad FROM (
      SELECT doc_id, unnest(generate_series(1, len(spans))) AS i, spans
      FROM read_parquet('{ORACLE_INTERLEAVED}')
    ) WHERE spans[i].kind <> 'text'
      AND spans[i].media_ref <> 'media://' || md5(doc_id || ':' || cast(spans[i].offset AS VARCHAR))
    """,
)
def media_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media spans carry the deterministic media_ref (spec.media_ref) — both
    engines recompute the md5 and count mismatches. Expect {bad: 0}."""
    df = spark.read.parquet(interleaved_path(sf_dir))
    s = df.select("doc_id", F.explode("spans").alias("s")).where(F.col("s.kind") != "text")
    expected = F.concat(
        F.lit("media://"),
        F.md5(F.concat(F.col("doc_id"), F.lit(":"), F.col("s.offset").cast("string"))),
    )
    return s.select(
        F.sum(F.when(F.col("s.media_ref") != expected, 1).otherwise(0)).cast("long").alias("bad")
    )


@query(
    "media_attrs_per_doc",
    oracle=f"""
    SELECT doc_id,
           sum(CASE WHEN s.kind <> 'text' THEN 1 ELSE 0 END) AS n_media,
           max(s.offset) AS max_offset,
           coalesce(string_agg(CASE WHEN s.kind <> 'text' THEN s.media_ref END, ',' ORDER BY s.offset), '') AS media_refs
    FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet('{ORACLE_INTERLEAVED}'))
    GROUP BY doc_id
    """,
)
def media_attrs_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: media_ref spans ride along as node attributes (north_star) — the
    carried-attrs aggregation, offset-ordered."""
    df = spark.read.parquet(interleaved_path(sf_dir))
    s = df.select("doc_id", F.explode("spans").alias("s"))
    return s.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s.kind") != "text", 1).otherwise(0)).cast("long").alias("n_media"),
        F.max("s.offset").alias("max_offset"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("s.kind") != "text", F.struct(F.col("s.offset").alias("o"), F.col("s.media_ref").alias("m")))
                    )
                ),
                lambda st: st["m"],
            ),
            ",",
        ).alias("media_refs"),
    )


# =====================================================================
# Dedup family + ANN (training-data pipeline operators)
# =====================================================================

# Corpus with planted near-duplicates: docs < 50 get a mutated copy. Both
# engines build it identically so the dedup operators have real positives.
_CLEAN_SQL = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
_DUP_CORPUS_SQL = f"""
  corpus AS (
    SELECT cast(doc_id AS VARCHAR) AS doc_id, text FROM documents
    UNION ALL
    SELECT 'dup_' || cast(doc_id AS VARCHAR) AS doc_id, text || ' extradup' AS text
    FROM documents WHERE doc_id < 50),
  t AS (SELECT doc_id, string_split({_CLEAN_SQL}, ' ') AS toks FROM corpus),
  sh AS (
    SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                ELSE [array_to_string(toks, ' ')] END AS shingles
    FROM t)
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    base = d.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    dups = d.where(F.col("doc_id") < 50).select(
        F.concat(F.lit("dup_"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extradup")).alias("text"),
    )
    return base.unionByName(dups)


@query(
    "minhash_lsh_dedup",
    oracle=f"""
    WITH {_DUP_CORPUS_SQL},
    mh AS (
      SELECT doc_id, shingles,
             list_transform(generate_series(0, 15),
                            i -> list_min(list_transform(shingles, s -> md5(i || ':' || s)))) AS sig
      FROM sh),
    banded AS (
      SELECT doc_id, shingles, b,
             array_to_string(sig[b*4+1 : b*4+4], '|') AS key
      FROM (SELECT doc_id, shingles, sig, unnest(generate_series(0, 3)) AS b FROM mh)),
    cand AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM banded a JOIN banded b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT c.src, c.dst,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(sa.shingles || sb.shingles)), 6) AS jaccard
    FROM cand c JOIN sh sa ON c.src = sa.doc_id JOIN sh sb ON c.dst = sb.doc_id
    WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / len(list_distinct(sa.shingles || sb.shingles)), 6) >= 0.5
    """,
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection: shingle → md5-minhash(16) → 4 bands →
    bucket join → exact-Jaccard verify >= 0.5. Fully SQL-checked (md5-keyed
    permutations keep the signatures engine-agnostic)."""
    from .operators.dedup import minhash_near_dups

    return minhash_near_dups(_dup_corpus(spark, sf_dir), jaccard_threshold=0.5)


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH t AS (
      SELECT cast(doc_id AS VARCHAR) AS doc_id, source,
             string_split({_CLEAN_SQL}, ' ') AS toks
      FROM documents),
    sh AS (
      SELECT doc_id, source,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM t)
    SELECT a.doc_id AS src, b.doc_id AS dst,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / len(list_distinct(a.shingles || b.shingles)), 6) > 0
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard within source blocks (> 0 pairs only)."""
    from .operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source"
    )
    return ngram_jaccard_pairs(d, threshold=1e-9).where(F.col("jaccard") > 0)


@query("simhash_near_dups")  # bit-level pandas UDF — no SQL twin; rows-only check
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) LSH near-dup over the planted-dup corpus (hamming <= 8)."""
    from .operators.dedup import simhash_near_dups

    return simhash_near_dups(_dup_corpus(spark, sf_dir))


@query(
    "embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, label, cast(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS src, b.vec_id AS dst,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, blocked by the label column (IVF-partition
    analog): only same-block pairs are compared."""
    from .operators.dedup import embedding_near_dups

    e = load(spark, sf_dir, "embeddings")
    return embedding_near_dups(e, id_col="vec_id", block_col="label", threshold=0.4).withColumnRenamed(
        "cosine", "cosine"
    )


@query(
    "ann_ivf_top10",
    oracle="""
    WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cvec FROM e ORDER BY vec_id ASC LIMIT 8),
    scored AS (
      SELECT e.vec_id, e.v, c.centroid_id,
             round(list_cosine_similarity(e.v, c.cvec), 6) AS csim
      FROM e, c),
    assign AS (
      SELECT vec_id, v, centroid_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rn
        FROM scored) WHERE rn = 1),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    probed AS (
      SELECT centroid_id FROM (
        SELECT c.centroid_id, round(list_cosine_similarity(c.cvec, q.qv), 6) AS qsim
        FROM c, q ORDER BY qsim DESC, centroid_id ASC LIMIT 2))
    SELECT a.vec_id, round(list_cosine_similarity(a.v, q.qv), 6) AS sim
    FROM assign a JOIN probed USING (centroid_id), q
    ORDER BY sim DESC, vec_id ASC LIMIT 10
    """,
)
def ann_ivf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 8 deterministic centroids, probe the 2 nearest — the
    scale path next to knn_cosine_top10's exact baseline."""
    from .operators.similarity import ivf_topk

    e = load(spark, sf_dir, "embeddings")
    qvec = [r[0] for r in e.where(F.col("vec_id") == 0).select("embedding").collect()][0]
    return ivf_topk(e, qvec, k=10, n_centroids=8, n_probe=2)


# =====================================================================
# Search strategies (SURVEY.md §2.10) over the enriched table
# =====================================================================


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.pipeline import ensure_enriched

    return ensure_enriched(spark, sf_dir, out_root(sf_dir))


def _register_search() -> None:
    from .plans import search as S

    strategies = {
        "search_simple": (S.simple_search, S.simple_search_sql),
        "search_advanced": (S.advanced_search, S.advanced_search_sql),
        "search_pro": (S.pro_search, S.pro_search_sql),
        "search_pro_enhanced": (S.pro_search_enhanced, S.pro_search_enhanced_sql),
        "search_kb": (S.search_kb, S.search_kb_sql),
    }
    for name, (fn, sql_fn) in strategies.items():

        def make(fn):
            def q(spark: SparkSession, sf_dir: str) -> DataFrame:
                return fn(_enriched(spark, sf_dir))

            return q

        _REGISTRY[name] = make(fn)
        _ORACLES[name] = sql_fn(ORACLE_ENRICHED_GLOB)


_register_search()
