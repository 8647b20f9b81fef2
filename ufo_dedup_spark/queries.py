"""Driver-contract query battery: Spark implementations + DuckDB oracle SQL.

Each query exists twice: as a DataFrame program (Spark-first, exercising the
engine's operators) and as ANSI SQL the driver runs through DuckDB on the
same parquet tables. Column names and rounding are part of the contract —
both sides alias identically and round floating aggregates so IEEE
summation-order differences between engines can't flip the value hash.

Query -> SURVEY.md §2 operator coverage is noted per entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufo_dedup_spark.functions import text as TX
from ufo_dedup_spark.operators.pairs import score_buckets

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Relational core (scans S*, projections P*, joins J*, aggs A*, windows W*)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6-style multi-aggregate scan; predicate pushed to the parquet scan."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "top_customer_revenue",
    """
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def top_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 multi-way join + W1 top-k (TakeOrderedAndProject, no full sort)."""
    c = F.broadcast(_read(spark, sf_dir, "customer"))
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@register(
    "region_nation_acctbal",
    """
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def region_nation_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact joined to broadcast dimension chain (star-schema pattern)."""
    c = _read(spark, sf_dir, "customer")
    n = F.broadcast(_read(spark, sf_dir, "nation"))
    r = F.broadcast(_read(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J8: left_anti join (the skip-existing-pairs primitive)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "customers_with_open_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: left_semi join guard (IN-subquery semantics)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customer_top_orders",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def customer_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/A8: deterministic pick-top-per-group via row_number window."""
    o = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(AVG(value), 6) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analog of the streaming tumbling-window aggregation."""
    e = _read(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "orders_by_year",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY 1
    """,
)
def orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: histogram over a derived time key (the decade-histogram pattern)."""
    o = _read(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Dedup family over `documents`
# ---------------------------------------------------------------------------

# Shared tokenizer SQL fragments (must mirror functions/text.py exactly).
_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_DTOKS = (
    "list_filter(list_distinct(string_split_regex(lower(text), '[^a-z0-9]+')),"
    " t -> t <> '')"
)


@register(
    "exact_dup_groups",
    """
    SELECT md5(text) AS text_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS representative
    FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
    """,
)
def exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on raw text (A7 pattern)."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           md5(array_to_string({_TOKS}, ' ')) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text fingerprint (cosmetic variants collide)."""
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.fingerprint_col(F.col("text")).alias("fingerprint")
    )


@register(
    "doc_stats",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(len({_DTOKS}) AS INTEGER) AS n_distinct_tokens,
           ROUND(
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(len(list_filter({_TOKS},
                       t -> list_contains(['the','a','an','and','or','of','to',
                       'in','on','is','it','for','with','as','at','by','from',
                       'that','this','was'], t))) AS DOUBLE) / len({_TOKS})
                  ELSE 0.0 END, 6) AS stopword_ratio,
           ROUND(
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(list_sum(list_transform({_TOKS},
                       t -> length(t))) AS DOUBLE) / len({_TOKS})
                  ELSE 0.0 END, 6) AS avg_token_len,
           ROUND(least(1.0, len({_TOKS}) / 100.0) *
             CASE WHEN len({_TOKS}) > 0
                  THEN CAST(len({_DTOKS}) AS DOUBLE) / len({_TOKS})
                  ELSE 0.0 END, 6) AS quality_score
    FROM documents
    """,
)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics — all JVM-side Column expressions."""
    d = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.token_count_col(t).alias("n_tokens"),
        TX.distinct_token_count_col(t).alias("n_distinct_tokens"),
        F.round(TX.stopword_ratio_col(t), 6).alias("stopword_ratio"),
        F.round(TX.avg_token_len_col(t), 6).alias("avg_token_len"),
        TX.quality_score_col(t).alias("quality_score"),
    )


def _doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking candidate pairs over documents: key (lang, n_chars//100),
    cross-source only, canonical doc_id_a < doc_id_b, exact token Jaccard.

    The documents-table analog of the reference's (date, city, state)
    blocking join (J2) + K1 scoring, all JVM-side.
    """
    # tokens hashed to longs: array_intersect on longs is ~20x cheaper than
    # on strings, and Jaccard values are identical modulo 64-bit collisions
    # (probability ~1e-16 per pair), so the DuckDB string-list oracle still
    # matches bit-for-bit after rounding.
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.floor(F.col("n_chars") / F.lit(100.0)).cast("int").alias("len_bucket"),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    TX.tokens_col(F.col("text")), lambda t: F.xxhash64(t)
                )
            )
        ).alias("toks"),
    )
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("source_a"),
        "lang",
        "len_bucket",
        F.col("toks").alias("toks_a"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("source_b"),
        "lang",
        "len_bucket",
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size("toks_a") + F.size("toks_b") - inter
    return (
        a.join(b, on=["lang", "len_bucket"], how="inner")
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("source_a") != F.col("source_b")))
        .select(
            "id_a",
            "id_b",
            "lang",
            F.round(
                F.when(union > 0, inter.cast("double") / union.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("jaccard"),
        )
    )


_DOC_PAIRS_SQL = f"""
    WITH toks AS (
        SELECT doc_id, source, lang,
               CAST(floor(n_chars / 100.0) AS INTEGER) AS len_bucket,
               {_DTOKS} AS tk
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang,
           ROUND(
             CASE WHEN (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))) > 0
                  THEN CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                       / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)))
                  ELSE 0.0 END, 6) AS jaccard
    FROM toks a
    JOIN toks b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id AND a.source <> b.source
"""


@register("doc_blocking_pairs", _DOC_PAIRS_SQL)
def doc_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_pairs(spark, sf_dir)


@register(
    "doc_pair_score_buckets",
    f"""
    SELECT CASE WHEN jaccard >= 0.9 THEN '0.9-1.0'
                WHEN jaccard >= 0.7 THEN '0.7-0.9'
                WHEN jaccard >= 0.5 THEN '0.5-0.7'
                WHEN jaccard >= 0.3 THEN '0.3-0.5'
                ELSE '0.0-0.3' END AS bucket,
           COUNT(*) AS n_pairs
    FROM ({_DOC_PAIRS_SQL}) GROUP BY 1
    """,
)
def doc_pair_score_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: one-pass score histogram via the engine's score_buckets operator."""
    pairs = _doc_pairs(spark, sf_dir).withColumnRenamed("jaccard", "score")
    return score_buckets(pairs)


@register(
    "doc_pair_participants",
    f"""
    SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM ({_DOC_PAIRS_SQL})
        UNION ALL
        SELECT id_b AS id FROM ({_DOC_PAIRS_SQL})
    )
    """,
)
def doc_pair_participants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/U1: distinct participants via explode + distinct."""
    pairs = _doc_pairs(spark, sf_dir)
    return pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("id")
    ).distinct()


@register(
    "doc_pair_lang_stats",
    f"""
    SELECT lang, COUNT(*) AS n_pairs,
           ROUND(AVG(jaccard), 6) AS avg_jaccard,
           ROUND(MIN(jaccard), 6) AS min_jaccard,
           ROUND(MAX(jaccard), 6) AS max_jaccard
    FROM ({_DOC_PAIRS_SQL}) GROUP BY lang
    """,
)
def doc_pair_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-group pair statistics (method_stats pattern keyed by lang)."""
    return (
        _doc_pairs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
            F.round(F.min("jaccard"), 6).alias("min_jaccard"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


@register(
    "lang_block_admission",
    """
    SELECT lang FROM documents
    GROUP BY lang
    HAVING COUNT(DISTINCT source) >= 2 AND COUNT(*) <= 250
    """,
)
def lang_block_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the tier-3 admission aggregation shape on the documents table."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("block_n"),
            F.countDistinct("source").alias("distinct_n"),
        )
        .filter((F.col("distinct_n") >= 2) & (F.col("block_n") <= 250))
        .select("lang")
    )


# ---------------------------------------------------------------------------
# Similarity search over `embeddings`
# ---------------------------------------------------------------------------


@register(
    "top_similar_embeddings",
    """
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qe, q.qe))) AS cs
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, ROUND(cs, 4) AS cos_sim
    FROM scored ORDER BY cs DESC, vec_id ASC LIMIT 10
    """,
)
def top_similar_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: JVM-side zip_with/aggregate dot products
    against a broadcast query vector; TakeOrderedAndProject top-k."""
    e = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qe"))
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            (
                dot(F.col("emb"), F.col("qe"))
                / (
                    F.sqrt(dot(F.col("emb"), F.col("emb")))
                    * F.sqrt(dot(F.col("qe"), F.col("qe")))
                )
            ).alias("cs"),
        )
    )
    return (
        scored.orderBy(F.col("cs").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("cs", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Clustering, sessionization, embeddings, signatures
# ---------------------------------------------------------------------------


@register(
    "doc_clusters",
    f"""
    WITH RECURSIVE p AS (
        SELECT id_a, id_b FROM ({_DOC_PAIRS_SQL}) WHERE jaccard >= 0.5
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
    ),
    nodes AS (SELECT DISTINCT u AS id FROM edges),
    reach(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.u, r.comp FROM edges e JOIN reach r ON r.id = e.v
    )
    SELECT id, MIN(comp) AS cluster_id FROM reach GROUP BY id
    """,
)
def doc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed union-find (large-star/small-star) over near-dup edges;
    oracle = transitive closure via a recursive CTE. cluster_id = component
    min id on both sides."""
    from ufo_dedup_spark.operators.connected_components import (
        connected_components,
    )

    edges = _doc_pairs(spark, sf_dir).filter(F.col("jaccard") >= 0.5).select(
        "id_a", "id_b"
    )
    return connected_components(edges)


@register(
    "events_sessionize",
    """
    WITH x AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
        SELECT user_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM x
    )
    SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM y GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum —
    the classic stateful-stream op expressed as batch windows."""
    e = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    y = x.select(
        "user_id",
        F.sum("new_s")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    return y.groupBy("user_id").agg(
        F.max("sid").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "embedding_near_dup_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])))), 4
           ) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(
             list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                      CAST(a.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])))), 4
           ) >= 0.3
    """,
)
def embedding_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact pairwise baseline)."""
    from ufo_dedup_spark.operators.similarity_search import (
        embedding_near_dup_pairs,
    )

    return embedding_near_dup_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.3
    )


@register(
    "token_count_by_source",
    f"""
    SELECT source,
           CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(SUM(len({_DTOKS})) AS BIGINT) AS total_distinct_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source (training-data pipeline staple)."""
    d = _read(spark, sf_dir, "documents")
    t = F.col("text")
    return d.groupBy("source").agg(
        F.sum(TX.token_count_col(t)).cast("long").alias("total_tokens"),
        F.sum(TX.distinct_token_count_col(t))
        .cast("long")
        .alias("total_distinct_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---- non-SQL-expressible ops: rows-only driver check, pinned by pytest ----


@register("minhash_lsh_candidates")  # no oracle: hash permutations
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature -> LSH banding -> candidate pairs over documents
    (correctness pinned by tests/test_hashing.py + pipeline recall tests)."""
    from ufo_dedup_spark.functions.hashing import make_minhash_udf
    from ufo_dedup_spark.operators.minhash_lsh import lsh_candidate_pairs

    d = _read(spark, sf_dir, "documents")
    minhash = make_minhash_udf(num_perm=128, shingle_k=3, seed=42)
    signed = d.select(
        F.col("doc_id").alias("id"), minhash(F.col("text")).alias("minhash")
    )
    return lsh_candidate_pairs(signed, "id", "minhash", 42, 3, 64)


@register("simhash_fingerprints")  # no oracle: blake2b bit votes
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document."""
    from ufo_dedup_spark.functions.hashing import make_simhash_udf

    d = _read(spark, sf_dir, "documents")
    simhash = make_simhash_udf(shingle_k=2, seed=42)
    return d.select("doc_id", simhash(F.col("text")).alias("simhash"))


@register("ivf_topk_embeddings")  # no oracle: probe set is impl-defined
def ivf_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate nearest neighbors (pytest asserts equality
    with the brute-force result at full probe width)."""
    from ufo_dedup_spark.operators.similarity_search import (
        deterministic_centroids,
        ivf_topk,
    )

    e = _read(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    q = [float(v) for v in qrow["embedding"]]
    out = ivf_topk(
        e.filter(F.col("vec_id") != 0), q, k=10, n_centroids=16, n_probe=8
    )
    return out.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))
