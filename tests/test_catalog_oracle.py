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
