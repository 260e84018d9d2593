"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``finmapreduce_spark/queries/`` — one
builder + oracle pair per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from finmapreduce_spark.queries import all_queries  # noqa: E402

# The driver imports this file from an UNKNOWN cwd with its own plain
# SparkSession. The sys.path insert above fixes the DRIVER process,
# but Python WORKERS spawned by the executors inherit neither it nor
# the driver's cwd — so any mapInPandas/pandas_udf stage would die
# with ModuleNotFoundError unless the package is shipped to workers.
# addPyFile(zip) once per SparkContext makes every worker able to
# import finmapreduce_spark regardless of where the driver ran from.
_shipped: set[int] = set()


def _ensure_workers_can_import(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if id(sc) in _shipped:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(
        tempfile.gettempdir(), f"finmapreduce_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        pkg = os.path.join(_REPO_DIR, "finmapreduce_spark")
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _shipped.add(id(sc))


def _tune_session(spark: SparkSession) -> None:
    """Runtime-settable engine tuning for the driver's plain session.

    The driver builds SparkSession with defaults (shuffle.partitions=
    200); at sf0.01 that is pure scheduling overhead per wide stage.
    These are all runtime confs (safe to set on a live session) and
    none change results — only task counts and exchange sizing.
    """
    try:
        n = os.cpu_count() or 8
        spark.conf.set("spark.sql.shuffle.partitions", str(min(32, n)))
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # a locked-down conf must never fail the contract


def _cwd_proof(fn: Callable[[SparkSession, str], DataFrame]):
    def call(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_workers_can_import(spark)
        _tune_session(spark)
        return fn(spark, sf_dir)

    return call


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary — the A2–A4 aggregation shape)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from finmapreduce_spark.queries.relational import q1_pricing_summary

    _ensure_workers_can_import(spark)
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _cwd_proof(spec.spark) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    ops (driver then records a weaker rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
