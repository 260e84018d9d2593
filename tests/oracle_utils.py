"""Order-insensitive Spark↔DuckDB result comparison (test-side mimic
of the driver's correctness gate)."""

from __future__ import annotations

import math


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def assert_matches_oracle(sdf, duck, sql: str, min_rows: int = 1):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"columns {sorted(scols)} != {sorted(dcols)}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert len(srows) >= min_rows, f"suspiciously few rows: {len(srows)}"
    cs, cd = canon(srows, scols), canon(drows, dcols)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
