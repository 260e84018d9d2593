"""Multi-executor-shape smoke (r13 verdict next-round #8): run a
catalog slice under ``local-cluster[2,4,2048]`` — two SEPARATE
executor JVMs with their own Python workers — and value-check it
against the DuckDB oracles. local[*] hides a class of single-JVM
assumptions this mode exposes:

- Python package shipping: executors do NOT inherit the driver's
  sys.path or cwd, so every UDF-bearing query dies with
  ModuleNotFoundError unless the package zip ships via addPyFile
  (the __spark_entry__._ensure_workers_can_import path — exercised
  here exactly as the grading driver exercises it).
- Broadcast + localCheckpoint semantics cross real process
  boundaries (the CC loop's checkpoint blocks live in executor
  block managers, not the driver's).
- Task results serialize over RPC instead of sharing the heap.

The slice covers the engine's load-bearing plan shapes: scan+agg,
broadcast join, window top-k, banded LSH pair join, the iterative
connected-components loop, IVF ANN, a sketch, the Gopher rule
battery, chunking, and the full mock-LLM QA DAG (mapInPandas UDFs).

This module owns its SparkContext, so it SKIPS when another context
is live (the shared session fixture) — run it standalone:

    python -m pytest tests/test_local_cluster.py -q
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.compare import TABLES, canon  # noqa: E402

pytestmark = pytest.mark.local_cluster

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

SLICE = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "w3_topk_per_group",
    "dedup_lsh_pairs",
    "dedup_cluster_canonical",
    "ann_ivf_topk",
    "sketch_hll_distinct",
    "text_gopher_rules",
    "f2_chunk_documents",
    "pipeline_e2e_answers",
]


@pytest.fixture(scope="module")
def lc_spark():
    from pyspark import SparkContext
    from pyspark.sql import SparkSession

    if SparkContext._active_spark_context is not None:
        pytest.skip(
            "another SparkContext is active; local-cluster needs its own "
            "— run: python -m pytest tests/test_local_cluster.py"
        )
    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("local-cluster-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executor.memory", "1800m")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    # the driver-contract shipping path: executors can't import the
    # package without the zip
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    entry._ensure_workers_can_import(spark)
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def lc_duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", SLICE)
def test_catalog_slice_under_local_cluster(lc_spark, lc_duck, name):
    from finmapreduce_spark.queries import all_queries

    spec = all_queries()[name]
    sdf = spec.spark(lc_spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    lc_spark.catalog.clearCache()
    if spec.oracle is None:
        assert srows is not None  # rows-only check for non-SQL ops
        return
    res = lc_duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert canon(srows, scols) == canon(drows, dcols), name
