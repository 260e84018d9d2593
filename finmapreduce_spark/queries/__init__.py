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

import json
from collections.abc import Callable
from pathlib import Path
from typing import NamedTuple, Optional

from pyspark.sql import DataFrame, SparkSession


class QuerySpec(NamedTuple):
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]


# The driver evaluates a PREFIX of this catalog (budget-bound, ~50
# entries per round), so dict order is witness priority. The priority
# is pure data, derived from witnessed_rounds.json (a name →
# {round, verdict} record appended after every round from the
# driver's CORRECTNESS_r{N}.json):
#   1. queries whose LAST driver verdict was "fail" (fixes exist but
#      the driver must re-witness them),
#   2. queries never driver-witnessed, round-robin across families so
#      ANY cutoff point spans the whole surface,
#   3. previously-green queries, oldest witness round first.
# Regenerate the record with tools/update_witnessed.py after each
# round's CORRECTNESS file lands.
_WITNESSED_PATH = Path(__file__).with_name("witnessed_rounds.json")


def witnessed_rounds() -> dict[str, dict]:
    """name → {"round": int, "verdict": "pass"|"fail"} from driver history."""
    try:
        with open(_WITNESSED_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _round_robin(groups: list[list[str]]) -> list[str]:
    out: list[str] = []
    i = 0
    while any(groups):
        g = groups[i % len(groups)]
        if g:
            out.append(g.pop(0))
        i += 1
        if i > 10_000:  # defensive; can't trigger with finite input
            break
    return out


def all_queries() -> dict[str, QuerySpec]:
    from finmapreduce_spark.queries import (
        dedup,
        evaluation,
        multimodal,
        pipeline,
        relational,
        scoring,
        similarity,
        sketches,
        temporal,
        textops,
        tpch_shapes,
        training,
    )

    mods = (
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
        sketches,
    )
    out: dict[str, QuerySpec] = {}
    for mod in mods:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)

    hist = witnessed_rounds()
    # Priority head: open fails, then WEAK witnesses — a rows_only
    # verdict predates the query's exact oracle (the ml.MinHashLSH
    # cross-certification upgrade), so it must re-verify before any
    # hash-green credit merely refreshes.
    failed = [n for n in out if hist.get(n, {}).get("verdict") == "fail"] + [
        n for n in out if hist.get(n, {}).get("verdict") == "rows_only"
    ]
    placed = set(failed)
    fresh_by_fam = [
        [n for n in mod.QUERIES if n not in placed and n not in hist]
        for mod in mods
    ]
    # Previously-green: oldest witness round first so stale credit
    # refreshes before recent credit re-verifies; round-robin across
    # families within each round so any prefix spans the surface.
    seen_rounds = sorted({v["round"] for n, v in hist.items() if n in out})
    seen: list[str] = []
    for rnd in seen_rounds:
        seen += _round_robin(
            [
                [
                    n
                    for n in mod.QUERIES
                    if n not in placed and hist.get(n, {}).get("round") == rnd
                ]
                for mod in mods
            ]
        )
    ordered = failed + _round_robin(fresh_by_fam) + seen
    assert len(ordered) == len(out), "catalog reorder lost queries"
    return {n: out[n] for n in ordered}
