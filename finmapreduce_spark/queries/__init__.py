"""Query catalog — the driver-facing operator surface.

Each submodule exposes ``QUERIES: dict[str, QuerySpec]`` mapping an
operator name (SURVEY §2 ids in the name) to a Spark builder and an
equivalent DuckDB oracle SQL (None for non-SQL-expressible ops, which
the driver checks rows-only).

Builders take ``(spark, sf_dir)`` and return a DataFrame whose column
names match the oracle's aliases exactly (the driver sorts columns by
name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple, Optional

from pyspark.sql import DataFrame, SparkSession


class QuerySpec(NamedTuple):
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


def all_queries() -> dict[str, QuerySpec]:
    from finmapreduce_spark.queries import (
        dedup,
        evaluation,
        multimodal,
        pipeline,
        relational,
        scoring,
        similarity,
        temporal,
        textops,
        tpch_shapes,
        training,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        tpch_shapes,
        textops,
        dedup,
        similarity,
        pipeline,
        multimodal,
        evaluation,
        temporal,
        scoring,
        training,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
