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


def test_count_min_sketch_heavy_hitters(spark, sf_dir):
    """The third sketch of the 100 TB scale path: count_min_sketch
    over the token stream (one pass, mergeable, fixed memory) must
    over-estimate-only (CMS guarantee) and land within eps*N of the
    exact count for every heavy hitter — the swap for exact token
    counting when the distinct-token table itself is too big."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.session import read_table

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
    )
    exact = {r["w"]: r["c"] for r in toks.groupBy("w").agg(F.count("*").alias("c")).collect()}
    n_total = sum(exact.values())
    eps, conf = 0.001, 0.99
    sketch_bytes = toks.agg(
        F.count_min_sketch(F.col("w"), F.lit(eps), F.lit(conf), F.lit(42)).alias("s")
    ).collect()[0]["s"]
    # probe the sketch JVM-side for the top tokens
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_bytes)
    )
    top = sorted(exact.items(), key=lambda kv: -kv[1])[:10]
    for w, c in top:
        est = sketch.estimateCount(w)
        assert est >= c, (w, est, c)  # CMS never under-counts
        assert est <= c + eps * n_total * 2, (w, est, c)


def test_html_extract_engines_agree_on_adversarial_markup(spark):
    """The extraction chain must compute identical text in BOTH
    engines even when the document text contains its own markup —
    the case the synthetic corpus never produces (this is what the
    'g' flag on the DuckDB script/style replaces protects: Spark's
    regexp_replace is global, DuckDB's defaults to first match)."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.textops import (
        _EXTRACT_SQL,
        _PAGE_SQL,
        _extract_expr,
        _page_expr,
    )

    rows = [
        (1, "plain words only", "s1"),
        (2, "embedded <script>evil()</script> tag", "s1"),
        (3, "<style>.x{}</style> then <b>bold</b> text", "s2"),
        (4, "two <script>a</script> blocks <script>b</script> here", "s2"),
        (5, "half-open <script> never closed", "s3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["e"]
        for r in docs.select(
            "doc_id", _extract_expr(_page_expr()).alias("e")
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]),
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {_EXTRACT_SQL} AS e FROM "
            f"(SELECT doc_id, {_PAGE_SQL} AS html FROM documents)"
        ).fetchall()
    )
    assert got == want
