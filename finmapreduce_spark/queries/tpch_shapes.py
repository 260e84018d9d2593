"""Remaining classic decision-support plan shapes (TPC-H q8/q10/q11/
q13/q14/q15/q17/q18/q22 analogues on the synthetic star schema).

These complete the relational surface beyond what the reference's own
statistics layer needs (SURVEY §2.4/§2.6 note the missing shapes come
"free" once declared): scalar-subquery thresholds, decorrelated
per-group averages, HAVING-then-join-back, argmax-with-ties, outer-
join count-of-counts, and conditional-ratio aggregates. Each docstring
records the 1000-executor plan rationale; oracles are exact DuckDB
twins.

Schema adaptations (no partsupp / l_shipmode in the synthetic data):
q8/q14 use p_type domains {ECONOMY..PROMO}; q11's "value" is supplier
line revenue; q22's idle-customer predicate is "no orders in the final
year" (every customer has lifetime orders at these densities).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# q8: market share — the widest join tree in the suite (fact + 5 dims,
# nation twice) feeding a conditional-ratio aggregate.
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-year share of ASIA ECONOMY revenue supplied by
    NATION_5.

    Scale: every dimension (part filtered to one type, customer,
    supplier, nation×2, region) broadcasts, so the fact table crosses
    the wire exactly once — into the 7-row final agg. The ratio is a
    single conditional sum over the same rows, not a self-join of two
    aggregates.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nation), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nation), supp.s_nationkey == F.col("sn_key"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q10: returned-item reporting — 3-way join + global top-k.
# ---------------------------------------------------------------------------

def q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue on returned lines in a half-year.

    Scale: the orderdate filter prunes the orders scan before the
    join; the top-k runs on the post-agg (≤|customers|) rows as
    TakeOrderedAndProject — per-partition heaps of 20, no global
    sort of the fact table.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q11: supplier value vs a global scalar threshold (HAVING against an
# aggregate of the same aggregate).
# ---------------------------------------------------------------------------

def q11_value_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose line revenue exceeds 1.05× the mean supplier
    revenue.

    Scale: one shuffle builds the per-supplier aggregate
    (|suppliers| rows); the global mean of that small relation is a
    1-row broadcast cross join, not a second pass over the fact
    table. persist() keeps the shared subplan from recomputing.
    """
    li = _t(spark, sf_dir, "lineitem")
    sv = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("value"))
    sv = sv.persist()
    threshold = sv.agg((F.avg("value") * 1.05).alias("threshold"))
    return (
        sv.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_suppkey", F.round("value", 2).alias("supplier_value"))
    )


Q11_ORACLE = """
WITH sv AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem GROUP BY 1
)
SELECT l_suppkey, round(value, 2) AS supplier_value
FROM sv WHERE value > 1.05 * (SELECT avg(value) FROM sv)
"""


# ---------------------------------------------------------------------------
# q13: customer order-count distribution — outer join + count-of-counts.
# ---------------------------------------------------------------------------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed 0, 1, 2, … orders.

    Scale: orders pre-aggregate to ≤|customers| rows BEFORE the join
    (manual aggregate pushdown below the outer join — Catalyst won't
    move an agg through a join), so the join moves counts, not order
    rows. Zero-order customers come from the left join's nulls; the
    second agg is over ≤|customers| rows.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    counts = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce("n_orders", F.lit(0)).alias("c_count"))
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# q14: promotion revenue ratio — conditional agg over one join, one scan.
# ---------------------------------------------------------------------------

def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of two months' revenue from PROMO parts. Numerator and
    denominator share one scan (conditional sum), part broadcasts."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-03-01")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _revenue()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_pct")
        )
    )


Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-03-01'
"""


# ---------------------------------------------------------------------------
# q15: top supplier — argmax WITH ties over an aggregated view.
# ---------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max revenue in 1996 Q1; ties all kept.

    Scale: revenue aggregates to |suppliers| rows; the scalar max of
    that small relation broadcasts back as a 1-row cross join (never
    an unpartitioned window, which would funnel everything through
    one task). Equality against each engine's own computed max keeps
    the tie semantics engine-consistent.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_revenue"))
    rev = rev.persist()
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("revenue"))
    )


Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# q17: small-quantity revenue — decorrelated per-group average.
# ---------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-ized revenue of Brand#12 lines below 20% of their part's
    average quantity.

    Scale: the correlated subquery (per-part avg over the SAME rows)
    decorrelates to a window over l_partkey — ONE shuffle of the
    brand-pruned lines instead of the agg+join-back's two. The brand
    filter applies before the shuffle via a broadcast of the filtered
    part keys.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    w = W.partitionBy("l_partkey")
    flagged = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
    return flagged.filter(
        F.col("l_quantity") < 0.2 * F.col("part_avg_qty")
    ).agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# q18: large-volume customers — HAVING on a big agg, then join back.
# ---------------------------------------------------------------------------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders totalling > 300 units, with customer detail.

    Scale: the HAVING filter collapses the per-order aggregate to a
    handful of keys; that tiny survivor set broadcasts into the
    orders/customer joins, so neither dimension shuffles. (The
    per-order agg itself is the only full shuffle — unavoidable and
    partial-agg'd map-side.)
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, round(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# q22: idle high-balance customers — anti join + global scalar subquery.
# ---------------------------------------------------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: customers above the positive-balance average with
    no orders in the final data year.

    Scale: the scalar average is a 1-row broadcast; the NOT EXISTS is
    a left_anti join against date-pruned orders (the filter cuts the
    anti-join build side ~7×). Customer never shuffles twice: filter →
    anti join → small groupBy.
    """
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q16: supplier diversity — DISTINCT aggregation + anti-join exclusion.
# ---------------------------------------------------------------------------

def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (p_brand, p_size): how many DISTINCT suppliers ship the
    part, excluding suppliers in bad standing (negative balance).

    Scale: the exclusion list is tiny → broadcast left_anti before
    the expensive distinct; count(DISTINCT) expands to a two-phase
    agg (dedup shuffle on the full grouping+supplier key, then count)
    — Spark's expansion is exactly the scalable plan, and the
    pre-join filter keeps excluded suppliers out of BOTH phases.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    kept = li.join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        kept.join(F.broadcast(part), kept.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q2: min-cost supplier per part — correlated scalar-min subquery with
# tie-preserving join-back (no partsupp in the synthetic schema; unit
# cost comes from shipped lines).
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each STANDARD part of size < 10, the supplier(s) offering
    the minimum observed unit price (l_extendedprice / l_quantity),
    with nation detail. TPC-H q2's shape (`WHERE cost = (SELECT
    min(cost) ... WHERE same part)`) on the tables we have.

    Scale: the correlated min decorrelates to a window over l_partkey
    on the part-pruned lines — one shuffle, same rows compute the min
    and survive the filter (no agg+join-back second shuffle). Both
    dims broadcast. Tie equality compares each engine's own double
    division, so it is engine-consistent like q15's max.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") < 10))
        .select("p_partkey", "p_name")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("unit_cost", F.col("l_extendedprice") / F.col("l_quantity"))
    )
    w = W.partitionBy("l_partkey")
    best = li.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .distinct()
    )


Q2_ORACLE = """
WITH costs AS (
  SELECT p_partkey, p_name, l_suppkey,
         l_extendedprice / l_quantity AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size < 10
)
SELECT DISTINCT p_partkey, p_name, s_name, n_name,
       round(unit_cost, 4) AS unit_cost
FROM costs c
JOIN supplier ON c.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE unit_cost = (SELECT min(unit_cost) FROM costs c2
                   WHERE c2.p_partkey = c.p_partkey)
"""


# ---------------------------------------------------------------------------
# q9: product-type profit by nation and year — the classic 5-way join
# into a two-key agg (cost proxy from p_retailprice; no ps_supplycost).
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on *widget* parts per supplier nation per order year,
    where profit = discounted revenue − 10% of retail cost of the
    shipped quantity.

    Scale: part (name-pruned), supplier, and nation all broadcast;
    orders is the only co-shuffled join (orderkey), so the fact table
    crosses the wire once into a |nations|×|years| result. The profit
    expression folds into the scan projection — no post-join pass.
    The subtraction amplifies double summation-order error past the
    cent, so the sum accumulates in decimal(18,4) (exact, associative
    — safe under Spark's unordered partial aggregation) and only the
    final per-group value returns to double.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(amount.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.1 * p_retailprice * l_quantity
                           AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q12: priority-split conditional counts (no l_shipmode column; the
# CASE-pivot runs over l_returnflag instead).
# ---------------------------------------------------------------------------

def q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag in ship-year 1997: how many lines belong to
    urgent/high-priority orders vs the rest — q12's dual conditional
    count after a fact×orders join.

    Scale: the shipdate filter pushes into the parquet scan; the two
    CASE sums share one pass and partial-agg map-side; orders project
    to two columns before the (only) co-shuffled join.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q20: dominant-share suppliers — nested agg subquery feeding a
# semi-join chain (ps_availqty replaced by shipped-quantity share).
# ---------------------------------------------------------------------------

def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than 10% of some PROMO part's total
    shipped quantity — q20's nested-IN shape: an aggregate subquery
    derives a per-part threshold, qualifying (part, supplier) pairs
    reduce to a distinct supplier set, which semi-joins the dim.

    Scale: the per-(part,supplier) agg and the per-part total come
    from the SAME grouped relation (window over the agg output — a
    shuffle of |parts×suppliers| pre-aggregated rows, not raw lines).
    The distinct supplier set is tiny → broadcast semi join.
    """
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    pair_qty = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = W.partitionBy("l_partkey")
    qualifying = (
        pair_qty.withColumn("part_total", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") > 0.1 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(
            F.broadcast(qualifying),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", "n_name")
    )


Q20_ORACLE = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty,
           sum(sum(l_quantity)) OVER (PARTITION BY l_partkey) AS part_total
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
    GROUP BY 1, 2
  ) shares
  WHERE supp_qty > 0.1 * part_total
)
"""


# ---------------------------------------------------------------------------
# q21: sole-blame late suppliers — the double EXISTS/NOT-EXISTS
# self-join collapsed into one per-order aggregate pass.
# ---------------------------------------------------------------------------

def q21_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per supplier: the number of finished multi-supplier orders where
    that supplier was the ONLY one shipping late (> 90 days after the
    order date). TPC-H q21's semantics — EXISTS(another supplier's
    line) AND NOT EXISTS(another supplier's late line) — restated as:
    orders whose distinct-late-supplier set is exactly {S} and whose
    distinct-supplier count is > 1.

    Scale: the classic formulation self-joins lineitem twice (semi +
    anti) — three shuffles of the fact table. The set-valued per-order
    aggregate needs ONE shuffle on l_orderkey (late-supplier sets are
    bounded by suppliers-per-order, a handful), then explodes the
    singleton sets into a |suppliers|-sized count. The SQL oracle keeps
    the EXISTS form, pinning the rewrite's equivalence.
    """
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.collect_set(F.when(late, F.col("l_suppkey"))).alias("late_supps"),
        )
        .filter((F.col("n_supp") > 1) & (F.size("late_supps") == 1))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.select(F.explode("late_supps").alias("suppkey"))
        .groupBy("suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
    )


Q21_ORACLE = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_ORACLE),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_ORACLE),
    "q12_priority_counts": QuerySpec(q12_priority_counts, Q12_ORACLE),
    "q20_dominant_suppliers": QuerySpec(q20_dominant_suppliers, Q20_ORACLE),
    "q21_sole_late_suppliers": QuerySpec(q21_sole_late_suppliers, Q21_ORACLE),
    "q8_market_share": QuerySpec(q8_market_share, Q8_ORACLE),
    "q10_returned_top_customers": QuerySpec(q10_returned_top_customers, Q10_ORACLE),
    "q11_value_threshold": QuerySpec(q11_value_threshold, Q11_ORACLE),
    "q13_order_count_distribution": QuerySpec(
        q13_order_count_distribution, Q13_ORACLE
    ),
    "q14_promo_ratio": QuerySpec(q14_promo_ratio, Q14_ORACLE),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_ORACLE),
    "q17_small_quantity_revenue": QuerySpec(
        q17_small_quantity_revenue, Q17_ORACLE
    ),
    "q18_large_volume_customers": QuerySpec(
        q18_large_volume_customers, Q18_ORACLE
    ),
    "q22_idle_customers": QuerySpec(q22_idle_customers, Q22_ORACLE),
    "q16_supplier_diversity": QuerySpec(q16_supplier_diversity, Q16_ORACLE),
}
