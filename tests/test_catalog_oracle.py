"""Every catalog query hash-matches its DuckDB oracle (the same check
the driver runs at sf0.01; tests default to sf0.001 for speed)."""

from __future__ import annotations

import pytest

from finmapreduce_spark.queries import all_queries
from tests.oracle_utils import assert_matches_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    sdf = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert sdf.count() >= 0  # rows-only check (driver's weak path)
        return
    assert_matches_oracle(sdf, duck, spec.oracle, min_rows=0)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """The approximate scale-path twins of the exact operators:
    approx_count_distinct (HLL++) within 5% of exact, and
    percentile_approx within 2 percentile ranks — the swap documented
    for 100 TB where exact distinct/percentile shuffles are too big."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.session import read_table

    ev = read_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact_u"),
        F.approx_count_distinct("user_id").alias("approx_u"),
        F.percentile("value", 0.9).alias("exact_p90"),
        F.percentile_approx("value", 0.9, 10000).alias("approx_p90"),
        F.percentile("value", 0.88).alias("p88"),
        F.percentile("value", 0.92).alias("p92"),
    ).collect()[0]
    assert abs(row["approx_u"] - row["exact_u"]) <= max(1, 0.05 * row["exact_u"])
    assert row["p88"] <= row["approx_p90"] <= row["p92"]
