"""Relational operator surface (SURVEY §2.1–§2.6) on the synthetic
star schema.

Every query is the Spark-idiomatic expression of a reference operator
(id in the name / docstring); the paired DuckDB SQL is the
correctness oracle. Scale notes are inline — these plans are written
for a 1000-executor cluster even though tests run local[32]:
dimension joins broadcast, aggregations are partial+final by
construction, windows partition on high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: pricing summary (A2–A4 token-total aggregations re-expressed
# as the classic partial+final agg; reference mapreduce_pipeline.py:288-310)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy 2 low-cardinality keys + 8 aggregates over the fact table.

    Scale: map-side partial aggregation collapses each input partition
    to ≤|flag×status| rows before the shuffle — the shuffle moves
    O(partitions × 6) rows regardless of fact size. This is the plan
    shape every reference "token totals" aggregation (A2/A3/A4) takes.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# S1/P1: scan with projection, rename, null-coalesce, deterministic limit
# (reference financebench_loader.py:26-52 — project 7 fields, coalesce
# justification, limit num_samples)
# ---------------------------------------------------------------------------

def s1_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst pushes the projection into the parquet scan (ReadSchema
    lists only 4 of 5 columns) and the limit is a LocalLimit above it."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("doc_id"),
            F.col("text").alias("content"),
            F.coalesce(F.col("source"), F.lit("unknown")).alias("source"),
            F.col("n_chars"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


S1_ORACLE = """
SELECT doc_id, text AS content, coalesce(source, 'unknown') AS source, n_chars
FROM documents ORDER BY doc_id LIMIT 100
"""


# ---------------------------------------------------------------------------
# J1: QA × document broadcast join with missing-key error rows
# (reference mapreduce_pipeline.py:133-148 — dict lookup ≡ left join,
# missing doc → error row instead of failure)
# ---------------------------------------------------------------------------

def j1_broadcast_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact left-joins a broadcast dimension; null right side becomes a
    typed error row (P5 semantics), not a dropped record.

    Scale: customer is the small side → broadcast hash join, no
    shuffle of orders. At 100 TB the doc catalog stays ≪ executor
    memory, so the same hint holds; if one doc serves millions of QA
    rows the join is skew-immune because broadcast joins don't
    partition by key at all.
    """
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
    return joined.select(
        "o_orderkey",
        "o_custkey",
        F.coalesce("c_name", F.lit("")).alias("c_name"),
        F.when(F.col("c_custkey").isNull(), "error: customer not found")
        .otherwise("ok")
        .alias("status"),
    )


J1_ORACLE = """
SELECT o_orderkey, o_custkey,
       coalesce(c_name, '') AS c_name,
       CASE WHEN c_custkey IS NULL THEN 'error: customer not found' ELSE 'ok' END AS status
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


# J2: dedup keys before the expensive per-doc stage
# (reference base_pipeline.py:169-174 — parse each doc once for N questions)

def j2_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct() before the expensive UDF — partial distinct runs
    map-side, the shuffle carries unique keys only."""
    return _t(spark, sf_dir, "orders").select("o_custkey").distinct()


J2_ORACLE = "SELECT DISTINCT o_custkey FROM orders"


# Semi/anti joins (SURVEY §2.3 'free from df.join' — declared surface)

def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 urgent order — left_semi: no right columns
    materialize, no row multiplication (EXISTS semantics)."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


J_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no urgent order — left_anti (NOT EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


J_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


# Multi-way star join (the reference's statistics layer composes joins
# + aggs; this is the canonical snowflake traversal at scale)

def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region⋈nation⋈customer⋈orders⋈lineitem → revenue per nation.

    Scale: region/nation/customer broadcast in turn (all ≪ threshold);
    the only shuffle is the final partial+final agg on n_name. Catalyst
    + AQE pick broadcast automatically once sizes are known; the
    explicit hints pin the plan for the big-cluster case where
    statistics may be stale.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") != "")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q5_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name <> ''
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# A5: grouped stats with exact median (reference mapreduce_pipeline.py:435-467
# — avg + statistics.median of per-question timings)
# ---------------------------------------------------------------------------

def a5_group_stats_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.median("value"), 6).alias("median_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


A5_ORACLE = """
SELECT event_type, count(*) AS n,
       round(avg(value), 6) AS avg_value,
       round(median(value), 6) AS median_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A9: accuracy-by-type pivot (reference document_processing.py:464-508 —
# per question_type × judgment counts + accuracy)
# ---------------------------------------------------------------------------

PIVOT_STATUSES = ["F", "O", "P"]


def a9_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(type).pivot(class).count() + derived rate — the exact
    shape of the reference's accuracy-by-question-type dict."""
    orders = _t(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .count()
    )
    total = sum(F.coalesce(F.col(s), F.lit(0)) for s in PIVOT_STATUSES)
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in PIVOT_STATUSES],
        F.round(F.coalesce(F.col("F"), F.lit(0)) / total, 6).alias("f_rate"),
    )


A9_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS "F",
       count(*) FILTER (o_orderstatus = 'O') AS "O",
       count(*) FILTER (o_orderstatus = 'P') AS "P",
       round(count(*) FILTER (o_orderstatus = 'F') / count(*), 6) AS f_rate
FROM orders GROUP BY o_orderpriority
"""


# A12: confusion matrix (reference scripts/llm_judge_evaluation.py:254+)

def a12_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """true×pred counts. 'pred' is a deterministic mock judgment
    derived from the row (P7 normalization chain: lower + when/otherwise)."""
    ev = _t(spark, sf_dir, "events")
    pred = (
        F.when(F.col("value") > 50, "purchase")
        .when(F.col("value") > 10, "click")
        .otherwise("view")
    )
    return (
        ev.withColumn("pred_type", pred)
        .groupBy(F.lower("event_type").alias("true_type"), "pred_type")
        .count()
        .withColumnRenamed("count", "n")
    )


A12_ORACLE = """
SELECT lower(event_type) AS true_type,
       CASE WHEN value > 50 THEN 'purchase'
            WHEN value > 10 THEN 'click'
            ELSE 'view' END AS pred_type,
       count(*) AS n
FROM events GROUP BY 1, 2
"""


# Rollup (declared surface, SURVEY §2.4 note)

def a_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total_price",
        )
    )


ROLLUP_ORACLE = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# W2: fixed-size batching (reference async_evaluation.py:389-404 — judge
# batches of 5, batch_idx = i // 5)
# ---------------------------------------------------------------------------

def w2_fixed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over a global order → floor((rn-1)/5) batch id →
    per-batch aggregates.

    Scale: a single unpartitioned window is a deliberate bottleneck —
    fine here because the reference's judge batching is inherently a
    global sequence; for 100 TB the order key would be (shard_id,
    qa_id) with batching per shard (same expression, partitionBy
    added).
    """
    ev = _t(spark, sf_dir, "events")
    w = W.orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("batch_id", F.floor((F.col("rn") - 1) / 5))
        .groupBy("batch_id")
        .agg(
            F.count("*").alias("batch_size"),
            F.round(F.sum("value"), 4).alias("batch_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


W2_ORACLE = """
SELECT CAST(floor((rn - 1) / 5) AS BIGINT) AS batch_id,
       count(*) AS batch_size,
       round(sum(value), 4) AS batch_value,
       min(event_id) AS first_event,
       max(event_id) AS last_event
FROM (SELECT *, row_number() OVER (ORDER BY event_id) AS rn FROM events)
GROUP BY 1
"""


# W3: top-k per group (reference augment_finqa.py:123-137 — top-8
# priority sentences per entry)

def w3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 orders per priority class by price; deterministic tiebreak
    on the unique key. Scale: partitionBy a real key → parallel windows;
    AQE handles the skewed 'NOT SPECIFIED' class."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 8)
        .select("o_orderpriority", "rk", "o_orderkey",
                F.round("o_totalprice", 2).alias("price"))
    )


W3_ORACLE = """
SELECT o_orderpriority, CAST(rk AS INT) AS rk, o_orderkey,
       round(o_totalprice, 2) AS price
FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
WHERE rk <= 8
"""


def w3_topk_per_group_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 twin with explicit partition-local pruning: each input
    partition keeps only its own top-8 per group in one bounded Arrow
    pass (state is O(|groups|×8) rows, merged batch by batch). Any row
    in a group's global top-8 is in that group's top-8 within its own
    partition (total order: price desc, key asc), so the prune is
    lossless and the result — and oracle — are identical to
    w3_topk_per_group.

    Honesty note (measured, test_plans pins both): Spark ≥3.5 already
    prunes the rank-filter window's exchange via
    Sort(local) → WindowGroupLimit(Partial), so the plain w3 shuffles
    ≤8/group/partition too. What this variant changes is the map side:
    the JVM pushdown still SORTS each full partition (O(n log n),
    spillable on wide rows); the bounded prune never materializes more
    than |groups|×8 rows. It is the pattern to reach for when the
    pushdown does not apply — rank keys the optimizer can't push
    (UDF-scored ordering, per-group quotas that vary by key) — at the
    price of one Arrow round-trip of the scan.
    """
    import pandas as pd

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )

    def local_topk(batches):
        best = None
        for pdf in batches:
            cand = pd.concat([best, pdf]) if best is not None else pdf
            cand = cand.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            best = cand.groupby("o_orderpriority", sort=False).head(8)
        if best is not None:
            yield best

    pruned = orders.mapInPandas(local_topk, orders.schema)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        pruned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 8)
        .select("o_orderpriority", "rk", "o_orderkey",
                F.round("o_totalprice", 2).alias("price"))
    )


# W4: argmax per group (reference augment_finqa.py:138-160 —
# best-match-per-sentence)

def w4_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("best_price"))
    )


W4_ORACLE = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
WHERE rk = 1
"""


# W6: preview truncate (reference webapp endpoints.py:398-401)

def w6_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring("text", 1, 100).alias("preview"),
        (F.length("text") > 100).alias("truncated"),
    )


W6_ORACLE = """
SELECT doc_id, substring(text, 1, 100) AS preview,
       length(text) > 100 AS truncated
FROM documents
"""


# ---------------------------------------------------------------------------
# Set ops (SURVEY §2.6 — unionByName for error-row merge, rest declared)
# ---------------------------------------------------------------------------

def setop_union_error_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 pattern: ok rows ∪ typed error rows via unionByName."""
    orders = _t(spark, sf_dir, "orders")
    ok = orders.filter(F.col("o_totalprice") > 1000).select(
        "o_orderkey", F.lit("ok").alias("status")
    )
    err = orders.filter(F.col("o_totalprice") <= 1000).select(
        "o_orderkey", F.lit("error: below minimum").alias("status")
    )
    return ok.unionByName(err)


SETOP_UNION_ORACLE = """
SELECT o_orderkey, 'ok' AS status FROM orders WHERE o_totalprice > 1000
UNION ALL
SELECT o_orderkey, 'error: below minimum' AS status FROM orders WHERE o_totalprice <= 1000
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in BUILDING ∩ customers holding an open order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(open_cust)


SETOP_INTERSECT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.exceptAll(open_cust).distinct()


SETOP_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
"""


# ---------------------------------------------------------------------------
# F7: JSON field extraction (reference async_llm_client.py:144-195 —
# robust parse; the strict fast path is from_json / get_json_object)
# ---------------------------------------------------------------------------

def f7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # The metric k is an INTEGER by contract: only integral strings
    # cast; anything else (missing key, '{"k": "str"}', '1.5',
    # '1e3') lands in the NULL group. The regex gate is load-bearing
    # for parity, not just totality: Spark's try_cast('1.5' AS LONG)
    # yields NULL while DuckDB's TRY_CAST rounds it to 2 — lenient
    # numeric casts DIVERGE between engines, integral-only casts
    # cannot. It also avoids the ANSI CAST_INVALID_INPUT job kill.
    # The cast INSIDE the regex guard is try_cast, not cast: a
    # 19+-digit integral string passes the regex but overflows
    # BIGINT, and ANSI cast throws CAST_OVERFLOW — try_cast NULLs
    # it in Spark exactly as TRY_CAST does in DuckDB (ADVICE r03).
    ks = F.get_json_object("props", "$.k")
    return (
        ev.select(
            "event_id",
            F.when(ks.rlike("^-?[0-9]+$"), ks.try_cast("long")).alias("k"),
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


# json_valid guard: DuckDB's json_extract_string THROWS on malformed
# JSON where Spark's get_json_object returns NULL; the integral-only
# regex mirrors the engine (see f7_json_extract)
F7_ORACLE = """
SELECT CASE WHEN json_valid(props)
            AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+$')
            THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k,
       count(*) AS n
FROM events GROUP BY 1
"""


# F17: md5 cache key (reference document_processing.py:117-134)

def f17_cache_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws("|", F.col("source"), F.col("lang"), F.col("n_chars"))
        ).alias("cache_key"),
    )


F17_ORACLE = """
SELECT doc_id, md5(source || '|' || lang || '|' || CAST(n_chars AS VARCHAR)) AS cache_key
FROM documents
"""


# F18: timestamp formatting + monthly histogram

def f18_monthly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .groupBy("month")
        .agg(F.count("*").alias("n"))
    )


F18_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sessionization (north-star events surface; lag + gap + cumulative sum)
# ---------------------------------------------------------------------------

def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions split on >1h inactivity gaps.

    Scale: windows partition on user_id (high cardinality → parallel);
    the comparison is on native timestamps (no epoch conversion, so no
    sub-second truncation disagreements between engines).
    """
    # events with NULL ts cannot be placed in a session — and they
    # order NULLS FIRST in Spark vs NULLS LAST in DuckDB, so keeping
    # them would also split sessions differently per engine
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("prev_ts").isNull()
        | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 1 HOUR")),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("new_session", gap)
        .withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 4) AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM sessions GROUP BY user_id, session_id
"""


# Tumbling-window rollup (batch twin of the streaming pipeline;
# SURVEY §2.9 — the only temporal surface the serving mode needs)

def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


HOURLY_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n,
       round(sum(value), 4) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""




# ---------------------------------------------------------------------------
# Exact multi-percentile aggregation (the latency-report shape: p50/p90/p99).
# Spark's percentile() interpolates identically to ANSI quantile_cont;
# at 100 TB swap to percentile_approx and accept the sketch error — the
# plan shape (partial agg -> merge) is the same.
# ---------------------------------------------------------------------------

def a_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.9), 6).alias("p90"),
        F.round(F.percentile("value", 0.99), 6).alias("p99"),
    )


A_QUANTILES_ORACLE = """
SELECT event_type, count(*) AS n,
       round(quantile_cont("value", 0.5), 6) AS p50,
       round(quantile_cont("value", 0.9), 6) AS p90,
       round(quantile_cont("value", 0.99), 6) AS p99
FROM events GROUP BY 1
"""




# ---------------------------------------------------------------------------
# TPC-H-shaped breadth: q6 (the pushdown showcase — pure filter+agg,
# every predicate must reach the scan) and q3 (join + agg + top-k with
# date predicates on both sides of the join).
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filters on 3 scan columns, single global agg — the whole query
    should compile to scan(PushedFilters)+partial/final agg, zero
    joins, one tiny shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed before a date joined to lineitems shipped after
    it; top-10 orders by revenue. Date filters prune BOTH scan sides
    before the join; the top-k is a global sort of the aggregated
    (small) result, not the fact table."""
    cutoff = "1998-01-01"
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )
    return (
        agg.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
            "revenue",
        )
    )


Q3_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""




# ---------------------------------------------------------------------------
# Brand × supplier-nation revenue: the remaining star legs (part,
# supplier) — two broadcast dims against the fact, two-key agg.
# ---------------------------------------------------------------------------

def q_brand_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return joined.groupBy("p_brand", F.col("n_name").alias("supp_nation")).agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


Q_BRAND_ORACLE = """
SELECT p_brand, n_name AS supp_nation, count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Weekly cohort retention: users bucketed by first-active week; for
# each (cohort, week-offset), the fraction still active. The canonical
# product-analytics query: two aggs + one self-join on user_id, all
# keys uniform.
# ---------------------------------------------------------------------------

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    activity = ev.distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sized = cohorts.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    joined = activity.join(cohorts, "user_id")
    per_offset = joined.groupBy(
        "cohort_week",
        F.floor(
            F.datediff(F.col("week"), F.col("cohort_week")) / 7
        ).alias("week_offset"),
    ).agg(F.countDistinct("user_id").alias("n_active"))
    return (
        per_offset.join(sized, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )


COHORT_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY 1
),
sized AS (
  SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
  FROM cohorts GROUP BY 1
),
per_offset AS (
  SELECT c.cohort_week,
         CAST(floor(date_diff('day', c.cohort_week, a.week) / 7) AS BIGINT) AS week_offset,
         count(DISTINCT a.user_id) AS n_active
  FROM activity a JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(p.cohort_week, '%Y-%m-%d') AS cohort_week, week_offset, n_active,
       round(n_active / cohort_size, 6) AS retention
FROM per_offset p JOIN sized s USING (cohort_week)
"""




# ---------------------------------------------------------------------------
# Running totals + lag deltas per user (cumulative window frame and
# offset functions — the W-family members the batching/top-k queries
# don't cover).
# ---------------------------------------------------------------------------

def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(W.unboundedPreceding, 0)), 6
        ).alias("running_value"),
        F.round(
            F.col("value") - F.lag("value", 1).over(w), 6
        ).alias("delta_prev"),
        F.row_number().over(w).alias("purchase_seq"),
    )


W_RUNNING_ORACLE = """
SELECT user_id, event_id,
       round(sum("value") OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING), 6) AS running_value,
       round("value" - lag("value", 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta_prev,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS purchase_seq
FROM events WHERE event_type = 'purchase'
"""




# ---------------------------------------------------------------------------
# Order-priority check (TPC-H q4 shape): EXISTS-correlated subquery as
# a left-semi join — the fact side only has to prove existence, so no
# row multiplication and the semi side's dedup is free.
# ---------------------------------------------------------------------------

def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    # EXISTS (line shipped after the order half-year mark)
    evidence = li.filter(F.col("l_shipdate") >= "1996-07-01").select("l_orderkey")
    qualified = orders.join(
        evidence, orders.o_orderkey == evidence.l_orderkey, "left_semi"
    )
    return qualified.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= TIMESTAMP '1996-07-01')
GROUP BY 1
"""




# ---------------------------------------------------------------------------
# Disjunctive-predicate join (TPC-H q19 shape): OR across
# (brand, quantity-band) conjunctions. The join key (partkey) still
# hash-joins; only the residual disjunction evaluates post-match —
# the plan to check is that the OR did NOT force a nested loop.
# ---------------------------------------------------------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#19") & F.col("l_quantity").between(1, 11)
         & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20)
           & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(20, 30)
           & (F.col("p_size") <= 15))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#19' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
"""




# ---------------------------------------------------------------------------
# Cross-nation volume shipping (TPC-H q7 shape): revenue flows between
# nation PAIRS — the same fact row joins two different dimension paths
# (supplier-nation and customer-nation), with a disjunctive pair
# filter. All four dims broadcast; one agg shuffle on the pair key.
# ---------------------------------------------------------------------------

def q7_nation_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy("supp_nation", "cust_nation").agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       count(*) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: JSON props column → typed aggregation
# (the F7 parse-chain's happy path, applied to an event-stream scan;
# at 100 TB the lesson is extract-then-agg, never agg-then-extract).
# ---------------------------------------------------------------------------

def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object stays inside whole-stage codegen (no UDF); the
    extracted value is cast once and aggregated per event_type —
    partial aggs collapse map-side so the shuffle carries |types|
    rows, with the JSON parse cost paid exactly once per row."""
    ev = _t(spark, sf_dir, "events")
    # integral-only cast (see f7_json_extract): avoids both the ANSI
    # CAST_INVALID_INPUT job kill AND the engine divergence on
    # fractional strings (Spark try_cast NULLs '1.5', DuckDB
    # TRY_CAST rounds it); try_cast under the regex guard also NULLs
    # INT-overflowing integral strings instead of CAST_OVERFLOW
    ks = F.get_json_object(F.col("props"), "$.k")
    k = F.when(ks.rlike("^-?[0-9]+$"), ks.try_cast("int"))
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_JSON_ORACLE = """
WITH kv AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              AND regexp_matches(json_extract_string(props, '$.k'),
                                 '^-?[0-9]+$')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END AS k
  FROM events
)
SELECT event_type, count(*) AS n_events,
       round(avg(k), 6) AS avg_k,
       max(k) AS max_k
FROM kv GROUP BY 1
"""


# ---------------------------------------------------------------------------
# RANGE-frame window: 7-day moving average per user — the time-based
# frame (rows frames cover "last N events"; range frames cover "last N
# days", which is what product metrics actually ask for).
# ---------------------------------------------------------------------------

def w_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: the user's mean purchase value over the
    trailing 7 days (inclusive), via a RANGE frame over epoch seconds.

    Scale: identical shuffle profile to any user-window op — one
    exchange on user_id, per-user sorted runs; the range frame is
    evaluated with a sliding two-pointer pass, O(events) per user,
    state bounded by the 7-day span (not the full history).
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # whole seconds in BOTH engines (DuckDB epoch() is fractional;
    # Spark unix_timestamp truncates) so range peers match exactly
    sec = F.unix_timestamp("ts").cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-7 * 86400, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


W_MOVING_ORACLE = """
SELECT user_id, event_id,
       round(avg("value") OVER (PARTITION BY user_id
         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 6) AS avg_7d,
       count(*) OVER (PARTITION BY user_id
         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_7d
FROM events WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Funnel conversion: ordered-step completion per user (view → click →
# purchase). One shuffle (per-user agg of step-min timestamps); step
# ordering is a pure column comparison — no self-joins, no windows.
# ---------------------------------------------------------------------------

def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts users completing each prefix of the funnel IN ORDER
    (a later step only counts if it happens after the earlier one).

    Scale: conditional-min aggregation collapses each user's history
    map-side; the funnel logic runs on one row per user. The classic
    alternative (k-way self-join on user_id) shuffles the event table
    k times — this shuffles it once.
    """
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    step1 = F.col("t_view").isNotNull()
    step2 = step1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    step3 = (
        step2
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_click"))
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(step1.cast("long")).alias("reached_view"),
        F.sum(step2.cast("long")).alias("reached_click"),
        F.sum(step3.cast("long")).alias("reached_purchase"),
    )


FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY 1
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
       CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase
FROM per_user
"""


# ---------------------------------------------------------------------------
# Value histogram via width_bucket — fixed bins, no sort, the
# profiling primitive percentile sketches don't give you (shape).
# ---------------------------------------------------------------------------

HIST_BINS = 20
HIST_LO, HIST_HI = 0.0, 100000.0


def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of o_totalprice in fixed-width bins: one narrow map
    (arithmetic bin id, identical expression in the oracle) + one tiny
    groupBy — shuffle carries ≤ bins+2 rows regardless of table size.
    Bin 0 and bins+1 are the under/overflow gutters."""
    orders = _t(spark, sf_dir, "orders")
    width = (HIST_HI - HIST_LO) / HIST_BINS
    x = F.col("o_totalprice")
    bin_ = (
        F.when(x < HIST_LO, F.lit(0))
        .when(x >= HIST_HI, F.lit(HIST_BINS + 1))
        .otherwise(F.floor((x - HIST_LO) / width) + 1)
    ).cast("long")
    return (
        orders.withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


HISTOGRAM_ORACLE = f"""
SELECT CAST(CASE WHEN o_totalprice < {HIST_LO} THEN 0
            WHEN o_totalprice >= {HIST_HI} THEN {HIST_BINS + 1}
            ELSE floor((o_totalprice - {HIST_LO})
                       / (({HIST_HI} - {HIST_LO}) / {HIST_BINS})) + 1
       END AS BIGINT) AS bin,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders GROUP BY 1
"""


def histogram_equidepth_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH decile histogram of o_totalprice: exact decile
    cutpoints, then each row counts the cutpoints below it to find its
    bucket — two passes, both ending in tiny aggregates.

    Scale: exact percentile collects a sorted sample per partition —
    fine for a cutpoint pass, but at 100 TB swap in percentile_approx
    (error-bounded in tests) and the plan is otherwise unchanged: the
    9-double cutpoint row broadcasts, bucketing is a narrow map, and
    the final shuffle carries 10 rows. Cutpoint interpolation never
    lands exactly on a data value here ((n-1)/10 is non-integral at
    every SF), so bucket membership is engine-stable.
    """
    orders = _t(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    cuts = orders.agg(
        F.percentile("o_totalprice", F.lit(qs)).alias("cuts")
    )
    x = F.col("o_totalprice")
    bucket = (
        F.lit(1)
        + F.aggregate(
            F.col("cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(x > c, 1).otherwise(0),
        )
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


EQUIDEPTH_ORACLE = """
WITH cuts AS (
  SELECT quantile_cont(o_totalprice,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
  FROM orders
)
SELECT CAST(1 + len(list_filter(cs, c -> o_totalprice > c)) AS BIGINT)
         AS bucket,
       count(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders CROSS JOIN cuts
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS with grouping_id — the third leg of the
# rollup/cube family (arbitrary set lists, not just prefixes/powerset).
# ---------------------------------------------------------------------------

def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (returnflag, linestatus), by returnflag alone, and
    grand total — one pass, one shuffle; grouping_id disambiguates the
    null-as-aggregate rows from genuine nulls."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT)
                 AS grouping_level,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_rows
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
         AS grouping_level,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


QUERIES: dict[str, QuerySpec] = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_ORACLE),
    "s1_scan_project": QuerySpec(s1_scan_project, S1_ORACLE),
    "j1_broadcast_left_join": QuerySpec(j1_broadcast_left_join, J1_ORACLE),
    "j2_distinct_keys": QuerySpec(j2_distinct_keys, J2_ORACLE),
    "j_semi_join": QuerySpec(j_semi_join, J_SEMI_ORACLE),
    "j_anti_join": QuerySpec(j_anti_join, J_ANTI_ORACLE),
    "q5_regional_revenue": QuerySpec(q5_regional_revenue, Q5_ORACLE),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_ORACLE),
    "q4_priority_check": QuerySpec(q4_priority_check, Q4_ORACLE),
    "q19_disjunctive_revenue": QuerySpec(q19_disjunctive_revenue, Q19_ORACLE),
    "q7_nation_flows": QuerySpec(q7_nation_flows, Q7_ORACLE),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_ORACLE),
    "q_brand_nation_revenue": QuerySpec(q_brand_nation_revenue, Q_BRAND_ORACLE),
    "cohort_retention": QuerySpec(cohort_retention, COHORT_ORACLE),
    "w_running_total": QuerySpec(w_running_total, W_RUNNING_ORACLE),
    "w_moving_avg_7d": QuerySpec(w_moving_avg_7d, W_MOVING_ORACLE),
    "a5_group_stats_median": QuerySpec(a5_group_stats_median, A5_ORACLE),
    "a_quantiles_by_type": QuerySpec(a_quantiles_by_type, A_QUANTILES_ORACLE),
    "a9_pivot_counts": QuerySpec(a9_pivot_counts, A9_ORACLE),
    "a12_confusion_matrix": QuerySpec(a12_confusion_matrix, A12_ORACLE),
    "a_rollup_counts": QuerySpec(a_rollup_counts, ROLLUP_ORACLE),
    "w2_fixed_batches": QuerySpec(w2_fixed_batches, W2_ORACLE),
    "w3_topk_per_group": QuerySpec(w3_topk_per_group, W3_ORACLE),
    "w3_topk_per_group_pruned": QuerySpec(w3_topk_per_group_pruned, W3_ORACLE),
    "w4_argmax_per_group": QuerySpec(w4_argmax_per_group, W4_ORACLE),
    "w6_preview": QuerySpec(w6_preview, W6_ORACLE),
    "setop_union_error_rows": QuerySpec(setop_union_error_rows, SETOP_UNION_ORACLE),
    "setop_intersect": QuerySpec(setop_intersect, SETOP_INTERSECT_ORACLE),
    "setop_except": QuerySpec(setop_except, SETOP_EXCEPT_ORACLE),
    "f7_json_extract": QuerySpec(f7_json_extract, F7_ORACLE),
    "f17_cache_key": QuerySpec(f17_cache_key, F17_ORACLE),
    "f18_monthly_histogram": QuerySpec(f18_monthly_histogram, F18_ORACLE),
    "sessionize_events": QuerySpec(sessionize_events, SESSIONIZE_ORACLE),
    "hourly_event_rollup": QuerySpec(hourly_event_rollup, HOURLY_ORACLE),
    "events_json_extract": QuerySpec(events_json_extract, EVENTS_JSON_ORACLE),
    "funnel_conversion": QuerySpec(funnel_conversion, FUNNEL_ORACLE),
    "histogram_order_totals": QuerySpec(histogram_order_totals, HISTOGRAM_ORACLE),
    "histogram_equidepth_orders": QuerySpec(
        histogram_equidepth_orders, EQUIDEPTH_ORACLE
    ),
    "a_grouping_sets": QuerySpec(a_grouping_sets, GROUPING_SETS_ORACLE),
}
