"""bench-trend regression flagging (pure comparison core + CLI)."""

from __future__ import annotations

import json

import pytest
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
    # wall regression alone: advisory (WARN, exit 0) unless --strict-wall
    b.write_text(json.dumps(_rec({"q1": 5.0})))
    warn = subprocess.run(
        [sys.executable, "tools/bench_trend.py", str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert warn.returncode == 0, warn.stdout + warn.stderr
    assert "WARN" in warn.stdout and "REGRESS" not in warn.stdout
    strict = subprocess.run(
        [sys.executable, "tools/bench_trend.py", "--strict-wall",
         str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert strict.returncode == 1
    assert "REGRESS" in strict.stdout
    # shuffle regression: gates regardless
    a.write_text(json.dumps(_rec({"q1": 1.0}, {"q1": {"read_mb": 1.0}})))
    b.write_text(json.dumps(_rec({"q1": 1.0}, {"q1": {"read_mb": 3.0}})))
    bad = subprocess.run(
        [sys.executable, "tools/bench_trend.py", str(a), str(b)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert bad.returncode == 1
    assert "REGRESS" in bad.stdout and "shuffle_read_mb" in bad.stdout


def test_load_bench_unwraps_driver_wrapper(tmp_path):
    from tools.bench_trend import load_bench

    rec = _rec({"q1": 1.0})
    wrapper = {"n": 2, "rc": 0, "tail": "...logs...", "parsed": rec}
    p = tmp_path / "BENCH_r02.json"
    p.write_text(json.dumps(wrapper, indent=1))
    assert load_bench(str(p)) == rec

    # pretty sidecar and raw-line shapes still load
    q = tmp_path / "BENCH_DETAILS_r03.json"
    q.write_text(json.dumps(rec, indent=1))
    assert load_bench(str(q))["queries"] == {"q1": 1.0}
    r = tmp_path / "line.json"
    r.write_text("some log line\n" + json.dumps(rec))
    assert load_bench(str(r))["queries"] == {"q1": 1.0}


def test_round_archives_trend_no_shuffle_regression():
    """Automated round-over-round trend: diff the two newest same-sf
    bench records on disk. Shuffle regressions FAIL (plan-shape
    deterministic signal); wall regressions only warn (local wall is
    noisy and rounds may run on different machines)."""
    import glob
    import os

    from tools.bench_trend import compare_rounds, load_bench, round_key

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json"))
        + glob.glob(os.path.join(root, "BENCH_DETAILS_r*.json")),
        key=lambda p: (round_key(p.replace("BENCH_DETAILS_", "BENCH_")), p),
    )
    recs = []
    for p in paths:
        try:
            rec = load_bench(p)
        except (ValueError, OSError):
            continue
        if rec.get("queries"):
            recs.append((os.path.basename(p), rec))
    same_sf = [
        (a, b)
        for a, b in zip(recs, recs[1:])
        if a[1].get("sf") == b[1].get("sf")
    ]
    if not same_sf:
        pytest.skip("fewer than two comparable bench records on disk")
    (pname, prev), (cname, cur) = same_sf[-1]
    flags = compare_rounds(prev, cur, threshold=0.2)
    # Intentional plan changes: a shuffle delta that IS the change a
    # round shipped, with its own plan pin. Each entry names the pin
    # so a stale allowlist is auditable; remove entries once both
    # compared records postdate the change.
    intentional = {
        # r13: banded_rank replaced the single-task frontier window —
        # the band-count aggregation + offset broadcast ARE new
        # exchanges by design (test_host_frontier_rank_is_distributed,
        # SCALE.md round-13 bench-trend note)
        "host_frontier_rank",
        # r15: the df-weight BROADCAST join (weight table = distinct
        # corpus shingles — a driver-killing broadcast at scale) was
        # replaced by a window count; the instance table now crosses
        # the wire once instead of riding the broadcast, so +8 MB
        # shuffle at sf0.1 IS the shipped change
        # (test_weighted_minhash_has_no_broadcast, OPTIMIZATION_r15.md)
        "dedup_weighted_minhash_pairs",
        # r15 session 2: the guarded scan-parallelism floor
        # (operators/parallelism.py) repartitions the one-split local
        # scan up to defaultParallelism — each floored lane's small
        # corpus/qa projection crosses the wire ONCE (+0.1-2.5 MB at
        # sf0.1, a no-op at scale where scans already fan out). The
        # wall drops 1.3-5x per lane; the byte delta IS the shipped
        # change (test_bpe_exact_lane_corpus_path_is_single_scan,
        # test_substring_diversity_single_scan_single_arrow_hop,
        # OPTIMIZATION_r15.md "Guarded scan-parallelism floor").
        "text_substring_diversity",
        "text_longest_repeat_uncapped",
        "dedup_lsh_pairs",
        "dedup_simhash_pairs",
        "dedup_simhash_pairs_grid",
        "dedup_semantic_verify",
        "pipeline_e2e_answers",
        "pipeline_e2e_answers_json",
        "pipeline_e2e_answers_plain",
        "pipeline_e2e_answers_baseline",
        "pipeline_e2e_answers_bpe",
        "bpe_chunk_documents_exact",
        "f2_chunk_documents",
        "sketch_countmin_grams",
        "j1_broadcast_left_join",
        # inherits the with_shingles floor through its LSH candidate
        # source (the Arrow LCS stage itself is unchanged)
        "dedup_lcs_containment",
    }
    shuffle_flags = [
        f
        for f in flags
        if f["metric"] != "wall_sec" and f["query"] not in intentional
    ]
    for f in flags:
        tag = " (intentional)" if f["query"] in intentional else ""
        print(f"trend {pname}->{cname}: {f}{tag}")
    assert shuffle_flags == [], shuffle_flags
