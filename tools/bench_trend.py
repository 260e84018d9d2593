"""Bench trend: compare per-round bench JSON lines and flag regressions.

The driver records one ``BENCH_r{N}.json`` per round (the single JSON
line ``bench.py`` prints: total wall, per-query seconds, per-query
shuffle MB). This tool reads them in round order — plus, optionally, a
fresh local ``bench.py`` output file via ``--current`` — and flags any
query whose wall time or shuffle volume regressed more than a
threshold (default 20%) against the previous round.

Shuffle regressions matter more than wall at 100 TB: local wall is
noisy (JIT, page cache), but shuffle bytes are a deterministic
property of the plan — a shuffle-MB jump means the plan itself got
worse (lost a broadcast, lost a partial agg), which multiplies at
cluster scale.

Usage:
    python tools/bench_trend.py                  # all BENCH_r*.json in repo root
    python tools/bench_trend.py --current /tmp/bench_now.json
    python tools/bench_trend.py --threshold 0.3 file1.json file2.json

Exit code 1 if a SHUFFLE or dropped-query regression is flagged (so
CI can gate on it). Wall regressions print as WARN only — same-code
wall at sf0.1 varies ±15% with machine state (ROADMAP), so wall is
advisory; pass --strict-wall to gate on it anyway.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

# Below these floors a relative diff is noise, not a regression:
# 0.3 s is sub-JIT-warmup wall jitter; 0.05 MB is a handful of pages.
WALL_FLOOR_SEC = 0.3
SHUFFLE_FLOOR_MB = 0.05


def load_bench(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # Three shapes: the single JSON line bench.py prints (possibly
    # with leading log lines), the pretty-printed BENCH_DETAILS
    # sidecar, and the driver's BENCH_r{N}.json wrapper whose
    # ``parsed`` field holds the bench record.
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        rec = json.loads(text.splitlines()[-1])
    if isinstance(rec, dict) and "parsed" in rec and "queries" not in rec:
        rec = rec["parsed"] or {}
    return rec


def round_key(path: str) -> int:
    m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else 10**9  # non-round files sort last


def compare_rounds(
    prev: dict, cur: dict, threshold: float = 0.2
) -> list[dict]:
    """Pure comparison core: list of flagged regressions between two
    bench records. A query is flagged when wall seconds or shuffle
    read MB grew by more than ``threshold`` relative to ``prev`` and
    the absolute value is above the noise floor."""
    flags: list[dict] = []
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    ps, cs = prev.get("shuffle", {}), cur.get("shuffle", {})
    for name in sorted(cq):
        if name not in pq:
            continue  # new query: nothing to regress against
        pw, cw = float(pq[name]), float(cq[name])
        if cw > max(pw * (1 + threshold), WALL_FLOOR_SEC) and pw > 0:
            flags.append(
                {
                    "query": name,
                    "metric": "wall_sec",
                    "prev": pw,
                    "cur": cw,
                    "ratio": cw / pw,
                }
            )
        pmb = float(ps.get(name, {}).get("read_mb", 0.0))
        cmb = float(cs.get(name, {}).get("read_mb", 0.0))
        # A record with NO shuffle sidecar at all (e.g. the driver's
        # wall-only capture) can't distinguish "0 MB broadcast plan"
        # from "not measured" — only compare when prev measured.
        if ps and cmb > max(pmb * (1 + threshold), SHUFFLE_FLOOR_MB):
            flags.append(
                {
                    "query": name,
                    "metric": "shuffle_read_mb",
                    "prev": pmb,
                    "cur": cmb,
                    "ratio": (cmb / pmb) if pmb else float("inf"),
                }
            )
    for name in sorted(set(pq) - set(cq)):
        flags.append(
            {"query": name, "metric": "dropped", "prev": float(pq[name]),
             "cur": None, "ratio": None}
        )
    return flags


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="*", help="bench JSON files in order")
    ap.add_argument("--current", help="fresh bench.py output to compare last")
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument(
        "--strict-wall",
        action="store_true",
        help="gate the exit code on wall regressions too (default: "
        "wall is advisory — WARN only; shuffle/dropped gate)",
    )
    args = ap.parse_args(argv)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = args.files or sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json")), key=round_key
    )
    if args.current:
        files.append(args.current)
    if len(files) < 2:
        print(f"need >=2 bench records to trend, have {len(files)}")
        return 0

    records = [(os.path.basename(p), load_bench(p)) for p in files]
    print(f"{'round':<24}{'total_wall':>12}{'queries':>9}{'shuffle_mb':>12}")
    for name, rec in records:
        total_mb = sum(
            s.get("read_mb", 0.0) for s in rec.get("shuffle", {}).values()
        )
        print(
            f"{name:<24}{rec.get('value', 0.0):>12.2f}"
            f"{len(rec.get('queries', {})):>9}{total_mb:>12.2f}"
        )

    any_gating = False
    for (pname, prev), (cname, cur) in zip(records, records[1:]):
        flags = compare_rounds(prev, cur, args.threshold)
        for fl in flags:
            advisory = fl["metric"] == "wall_sec" and not args.strict_wall
            if not advisory:
                any_gating = True
            if fl["metric"] == "dropped":
                print(f"DROPPED  {pname}->{cname}  {fl['query']}")
            else:
                tag = "WARN   " if advisory else "REGRESS"
                print(
                    f"{tag}  {pname}->{cname}  {fl['query']}"
                    f"  {fl['metric']}  {fl['prev']:.3f} -> {fl['cur']:.3f}"
                    f"  ({fl['ratio']:.2f}x)"
                )
    if not any_gating:
        print(
            f"no gating regressions > {args.threshold:.0%} between "
            "consecutive records (wall is advisory without --strict-wall)"
        )
    return 1 if any_gating else 0


if __name__ == "__main__":
    sys.exit(main())
