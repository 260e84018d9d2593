"""bench-trend regression flagging (pure comparison core + CLI)."""

from __future__ import annotations

import json
import subprocess
import sys

from tools.bench_trend import compare_rounds


def _rec(queries, shuffle=None):
    return {
        "metric": "headline_total_wall",
        "value": sum(queries.values()),
        "unit": "sec",
        "queries": queries,
        "shuffle": shuffle or {},
        "sf": 0.1,
    }


def test_wall_regression_flagged_above_threshold_and_floor():
    prev = _rec({"q1": 1.0, "q2": 2.0})
    cur = _rec({"q1": 1.5, "q2": 2.1})  # q1 +50%, q2 +5%
    flags = compare_rounds(prev, cur, threshold=0.2)
    assert [f["query"] for f in flags] == ["q1"]
    assert flags[0]["metric"] == "wall_sec"


def test_subfloor_jitter_not_flagged():
    # 0.05s -> 0.2s is 4x but under the 0.3s wall floor: noise.
    flags = compare_rounds(_rec({"q1": 0.05}), _rec({"q1": 0.2}), 0.2)
    assert flags == []


def test_shuffle_regression_flagged_independently_of_wall():
    prev = _rec({"q1": 1.0}, {"q1": {"read_mb": 1.0, "write_mb": 1.0}})
    cur = _rec({"q1": 1.0}, {"q1": {"read_mb": 2.0, "write_mb": 2.0}})
    flags = compare_rounds(prev, cur, 0.2)
    assert [(f["query"], f["metric"]) for f in flags] == [
        ("q1", "shuffle_read_mb")
    ]
    assert flags[0]["ratio"] == 2.0


def test_broadcast_to_shuffle_transition_flagged():
    # 0.0 MB -> 0.5 MB: a lost broadcast (inf ratio), must flag.
    prev = _rec({"q1": 1.0}, {"q1": {"read_mb": 0.0}})
    cur = _rec({"q1": 1.0}, {"q1": {"read_mb": 0.5}})
    flags = compare_rounds(prev, cur, 0.2)
    assert flags and flags[0]["ratio"] == float("inf")


def test_dropped_query_flagged_new_query_ignored():
    prev = _rec({"q1": 1.0, "gone": 1.0})
    cur = _rec({"q1": 1.0, "brand_new": 9.9})
    flags = compare_rounds(prev, cur, 0.2)
    assert [(f["query"], f["metric"]) for f in flags] == [("gone", "dropped")]


def test_cli_exit_codes(tmp_path):
    a = tmp_path / "BENCH_r1.json"
    b = tmp_path / "BENCH_r2.json"
    a.write_text(json.dumps(_rec({"q1": 1.0})))
    b.write_text(json.dumps(_rec({"q1": 1.0})))
    ok = subprocess.run(
        [sys.executable, "tools/bench_trend.py", str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert ok.returncode == 0, ok.stdout + ok.stderr
    b.write_text(json.dumps(_rec({"q1": 5.0})))
    bad = subprocess.run(
        [sys.executable, "tools/bench_trend.py", str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert bad.returncode == 1
    assert "REGRESS" in bad.stdout
