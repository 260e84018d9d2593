"""Temporal joins and event-time windowing over the ``events`` table.

The reference has no temporal operators (SURVEY §2.9: its judge
batching is positional, not event-time), but a training-data /
analytics engine at 100 TB needs them, and they are the canonical
"operator Spark lacks as a keyword" case: neither Spark SQL nor the
DataFrame API has AS OF / band-join syntax, so each is expressed as a
composition whose physical plan is the one you'd want on a cluster:

- **as-of join** — the union-and-window formulation: tag the two
  streams, union, one window sorted by (ts, side) per key, then
  ``last(..., ignorenulls)`` carries the most recent left-stream row
  forward. ONE shuffle on the join key, no range explosion, no
  per-row subquery — this is O(n log n) per key vs the O(n·m)
  naive theta join, and it scales to arbitrarily long histories.
- **band (range) join** — bucket blocking: quantize time into
  band-width buckets, equi-join on (key, bucket±1) candidates, then
  filter the exact band. Turns an inequality join Catalyst would
  nest-loop into a hash join with bounded fan-out (2 candidate
  buckets per probe row).
- **sliding windows** — native ``F.window`` (duration 1h, slide
  30m): each event lands in exactly duration/slide = 2 windows;
  whole-stage-codegen'd projection + hash agg, no UDFs.
- **cube** — multi-dimensional rollup counts, native ``cube()``
  with ``grouping()`` flags (SURVEY §2.4 note: free in Spark, absent
  in the reference).

Oracles express the same semantics in plain ANSI SQL (LATERAL
argmax / inequality join / unnest of the 2 covering windows / CUBE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.session import read_table

BAND_SECONDS = 30 * 60  # band-join width: preceding 30 minutes


def _events(spark, sf_dir):
    return read_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# As-of join: for each purchase, the latest click by the same user at
# or before the purchase timestamp (tie-break: highest event_id).
# ---------------------------------------------------------------------------

def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-and-window as-of join.

    Clicks get side=0, purchases side=1; within one user the window
    is ordered by (ts, side, event_id), so ``last(click, ignorenulls)``
    at a purchase row is exactly the max-(ts, event_id) click with
    click.ts <= purchase.ts. Single shuffle on user_id; no range join.
    """
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
        F.struct(F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")).alias(
            "click"
        ),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id", F.lit(None).cast(
            "struct<click_ts:timestamp,click_id:bigint>"
        ).alias("click"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn("last_click", F.last("click", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.click_id").alias("click_id"),
            F.col("last_click.click_ts").alias("click_ts"),
        )
    )


ASOF_ORACLE = """
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       c.click_id, c.click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT event_id AS click_id, ts AS click_ts
  FROM events c
  WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC
  LIMIT 1
) c ON true
"""


# ---------------------------------------------------------------------------
# Band (range) join via bucket blocking: events in the 30 minutes
# before each purchase, same user.
# ---------------------------------------------------------------------------

def range_join_band_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count same-user events in [purchase_ts - 30min, purchase_ts).

    Scale shape: quantize ts to 30-min buckets; each purchase probes
    its own bucket and the previous one (any event within the band
    must fall in one of those two), so the inequality predicate is
    evaluated only on hash-join survivors. At 100 TB this is the
    difference between a broadcast-nested-loop plan and a shuffled
    hash join with ~2× candidate fan-out.
    """
    ev = _events(spark, sf_dir)
    probe = ev.select(
        "user_id",
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
        F.floor(F.unix_timestamp("ts") / BAND_SECONDS).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.explode(
            F.array(
                F.floor(F.unix_timestamp("ts") / BAND_SECONDS) - 1,
                F.floor(F.unix_timestamp("ts") / BAND_SECONDS),
            )
        ).alias("bucket"),
    )
    joined = purchases.join(probe, ["user_id", "bucket"]).filter(
        (F.col("e_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {BAND_SECONDS} SECOND"))
        & (F.col("e_ts") < F.col("p_ts"))
    )
    return (
        joined.groupBy("purchase_id", "user_id", "p_ts")
        .agg(F.count("*").alias("n_preceding"))
        .select(
            "purchase_id",
            "user_id",
            F.col("p_ts").alias("purchase_ts"),
            "n_preceding",
        )
    )


RANGE_BAND_ORACLE = f"""
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       count(*) AS n_preceding
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL {BAND_SECONDS} SECOND
 AND e.ts < p.ts
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Sliding event-time windows: 1-hour windows sliding every 30 minutes.
# ---------------------------------------------------------------------------

def sliding_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.window(1h, 30m): each event replicates into exactly 2
    windows; hash aggregation, fully codegen'd (the same expression a
    Structured Streaming job would run with a watermark)."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    win = ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w")).agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 6).alias("revenue"),
    )
    return win.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "n_purchases",
        "revenue",
    )


SLIDING_ORACLE = """
WITH starts AS (
  SELECT e.*, t.s AS window_start
  FROM (SELECT *, time_bucket(INTERVAL 30 MINUTE, ts) AS tb
        FROM events WHERE event_type = 'purchase') e,
       LATERAL unnest([e.tb, e.tb - INTERVAL 30 MINUTE]) AS t(s)
)
SELECT window_start, window_start + INTERVAL 60 MINUTE AS window_end,
       count(*) AS n_purchases, round(sum("value"), 6) AS revenue
FROM starts
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Cube: counts and revenue over (event_type, day) with subtotal rows.
# ---------------------------------------------------------------------------

def a_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native cube() with grouping() flags (null data values vs
    subtotal rows stay distinguishable — the trap coalesce-based
    pivots fall into)."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    return (
        ev.cube("event_type", "day")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select("event_type", "day", "g_type", "g_day", "n", "total_value")
    )


CUBE_ORACLE = """
SELECT event_type, CAST(ts AS DATE) AS day,
       CAST(GROUPING(event_type) AS INT) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS INT) AS g_day,
       count(*) AS n, round(sum("value"), 6) AS total_value
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
"""


# ---------------------------------------------------------------------------
# SCD2 dimension build: collapse each user's event_type stream into
# type-2 history rows (valid_from / valid_to / version / is_current).
# The standard warehouse pattern for "what was this entity's state at
# time T" — built from an append-only event log in one pass.
# ---------------------------------------------------------------------------

def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension over (user_id, event_type):
    only CHANGES open a new version (consecutive duplicates collapse);
    each version carries [valid_from, valid_to) with valid_to = next
    change's start, null/'current' on the open row.

    Scale: both windows (change detection, then version numbering +
    lead over the surviving changes) partition on user_id with the
    same ordering, so Spark plans ONE shuffle and chains the Window
    nodes; per-user state is one user's history, never global. The
    change filter runs before the second window, so version numbering
    works on the (much smaller) change set.
    """
    # NULL-ts events cannot be versioned (no valid_from) — and they
    # order NULLS FIRST in Spark vs NULLS LAST in DuckDB, so keeping
    # them would also shift every subsequent version boundary
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    out = (
        changes.withColumn("version", F.row_number().over(w))
        .withColumn("valid_to_ts", F.lead("ts").over(w))
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "user_id",
        "event_type",
        F.col("version").cast("int").alias("version"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to_ts", fmt), F.lit("current")
        ).alias("valid_to"),
        F.col("valid_to_ts").isNull().alias("is_current"),
    )


SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT * FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       CAST(row_number() OVER w2 AS INT) AS version,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(ts) OVER w2, '%Y-%m-%d %H:%M:%S'),
                'current') AS valid_to,
       lead(ts) OVER w2 IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def events_range_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event stats for (user_id < 10 AND first 3 days) routed
    through the production Z-ORDER layout: a ``save_events_zorder``
    copy read back with both predicates.

    Scale: the Morton layout gives this scan row-group skipping on
    BOTH predicates at once (measured touch ratios pinned in
    tests/test_sources.py); a single-key sort would serve only one of
    them. This catalog entry pins end-to-end correctness of the
    adopted path — the oracle reads the plain events table, so any
    row lost or duplicated by the layout round-trip hash-mismatches.
    """
    import hashlib
    import os
    import tempfile

    from finmapreduce_spark.sources.sinks import save_events_zorder

    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"fmr_zorder_events_{tag}")
    save_events_zorder(ev, path, row_group_bytes=256 * 1024)
    back = spark.read.parquet(path).filter(
        (F.col("user_id") < 10) & (F.col("ts") < F.lit("2024-01-04"))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count_distinct("user_id").cast("long").alias("n_users"),
    )


ZORDER_SCAN_ORACLE = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id < 10 AND ts < TIMESTAMP '2024-01-04'
GROUP BY event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "scd2_event_type_history": QuerySpec(
        scd2_event_type_history, SCD2_ORACLE
    ),
    "events_range_zorder_scan": QuerySpec(
        events_range_zorder_scan, ZORDER_SCAN_ORACLE
    ),
    "asof_join_events": QuerySpec(asof_join_events, ASOF_ORACLE),
    "range_join_band_count": QuerySpec(range_join_band_count, RANGE_BAND_ORACLE),
    "sliding_window_revenue": QuerySpec(sliding_window_revenue, SLIDING_ORACLE),
    "a_cube_counts": QuerySpec(a_cube_counts, CUBE_ORACLE),
}


# ---------------------------------------------------------------------------
# SCD2 point-in-time lookup — "what was the dimension's value when
# this fact happened": every warehouse's temporal-join primitive,
# composed here with the SCD2 build in ONE plan. The Spark side is
# JOIN-FREE (union the version-start rows with the probe facts, one
# window per user carries the last version forward — the same
# one-shuffle as-of technique as asof_join_events); the ORACLE uses
# the independent range-join formulation (probe ⋈ versions ON
# valid_from <= ts < valid_to), so the value hash certifies that two
# different algorithms agree on the temporal semantics.
#
# Scale: one shuffle on user_id total (the SCD2 windows and the
# lookup window share partitioning, so Catalyst chains them on one
# exchange); per-user state is one user's history. The range-join
# formulation the oracle uses would be the broadcast path when the
# dimension is small; the union-and-window path is the one that
# survives a billion-version dimension.
# ---------------------------------------------------------------------------

PIT_PROBE_MOD = 10  # event_id % MOD == 7 plays the probe fact set


def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same NULL-ts exclusion (and engine-ordering rationale) as the
    # SCD2 build above; it also drops un-timestamped probe facts,
    # which have no point-in-time to resolve. NULL user_id is also
    # excluded: a lookup KEYED on user has no row to resolve against
    # — and Spark's NULL window partition would emit the probe while
    # the oracle's equi-join drops it
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .withColumn("version", F.row_number().over(w))
    )
    dim_rows = changes.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("src"),
        "version",
        F.col("event_type").alias("dim_type"),
    )
    probes = ev.filter(
        F.pmod("event_id", F.lit(PIT_PROBE_MOD)) == 7
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("src"),
        F.lit(None).cast("int").alias("version"),
        F.lit(None).cast("string").alias("dim_type"),
    )
    # at equal ts the dim row (src 0) sorts before the probe, so a
    # fact occurring exactly at a version start sees that version
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = (
        dim_rows.unionByName(probes)
        .withColumn("version_at", F.last("version", ignorenulls=True).over(w2))
        .withColumn("type_at", F.last("dim_type", ignorenulls=True).over(w2))
    )
    return filled.filter(F.col("src") == 1).select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("fact_ts"),
        F.col("version_at").cast("int").alias("version_at"),
        "type_at",
    )


PIT_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(row_number() OVER w2 AS INT) AS version
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
),
versions AS (
  SELECT user_id, event_type, version, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes
),
probes AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_id % {PIT_PROBE_MOD} = 7
    AND ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT p.user_id, p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS fact_ts,
       v.version AS version_at,
       v.event_type AS type_at
FROM probes p
JOIN versions v
  ON v.user_id = p.user_id
 AND v.valid_from <= p.ts
 AND (v.valid_to IS NULL OR p.ts < v.valid_to)
"""


QUERIES.update(
    {
        "scd2_point_in_time_lookup": QuerySpec(
            scd2_point_in_time_lookup, PIT_ORACLE
        ),
    }
)
