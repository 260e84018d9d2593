"""Per-stage task-metric skew report (ROADMAP #3).

Runs one catalog query under a UI-enabled diagnostic session, then
pulls per-task quantiles from Spark's REST status API
(``/api/v1/applications/{app}/stages/{id}/{attempt}/taskSummary``) and
reports, per completed stage, the max/median ratio of task duration
and shuffle-read bytes — the two numbers that say whether a hot key is
funneling through one task or AQE's skew splitting is holding.

This is the observability the reference never had (its skew story is
"one 10-K serves thousands of questions", SURVEY §4); on a cluster the
same REST API serves the same JSON, so this tool runs unchanged
against a history server.

Usage: python tools/skew_report.py [query ...] [--sf DIR] [--top N]
Prints ONE JSON line:
  {"query": ..., "stages": [{"stage": id, "tasks": n,
    "dur_ms": [min, med, max], "dur_skew": max/med,
    "shuffle_read": [min, med, max], "shuffle_skew": ...}, ...]}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finmapreduce_spark.queries import all_queries  # noqa: E402
from finmapreduce_spark.session import get_spark  # noqa: E402

QUANTILES = "0.0,0.5,1.0"  # min, median, max


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _metric(summary: dict, *path):
    node = summary
    for p in path:
        if node is None or p not in node:
            return None
        node = node[p]
    return node  # [min, med, max] floats


def stage_ids(api: str, app_id: str) -> set[int]:
    return {
        st["stageId"]
        for st in _get(f"{api}/applications/{app_id}/stages?status=complete")
    }


def stage_report(
    api: str, app_id: str, top: int, skip: set[int] = frozenset()
) -> list[dict]:
    stages = _get(f"{api}/applications/{app_id}/stages?status=complete")
    rows = []
    for st in stages:
        sid, att = st["stageId"], st["attemptId"]
        if sid in skip:  # stage belongs to a previously-reported query
            continue
        n = st.get("numCompleteTasks", 0)
        if n < 2:  # single-task stages can't be skewed
            continue
        try:
            summ = _get(
                f"{api}/applications/{app_id}/stages/{sid}/{att}/taskSummary"
                f"?quantiles={QUANTILES}"
            )
        except Exception:
            continue  # stage evicted from the store between calls
        dur = _metric(summ, "duration") or [0, 0, 0]
        sread = _metric(summ, "shuffleReadMetrics", "readBytes") or [0, 0, 0]
        iread = _metric(summ, "inputMetrics", "bytesRead") or [0, 0, 0]
        med_dur = dur[1] or 1.0
        rows.append(
            {
                "stage": sid,
                "tasks": n,
                "dur_ms": [round(x, 1) for x in dur],
                "dur_skew": round(dur[2] / med_dur, 2),
                "shuffle_read": [int(x) for x in sread],
                "shuffle_skew": (
                    round(sread[2] / sread[1], 2) if sread[1] else None
                ),
                "input_read": [int(x) for x in iread],
                "input_skew": (
                    round(iread[2] / iread[1], 2) if iread[1] else None
                ),
            }
        )
    rows.sort(key=lambda r: r["dur_skew"], reverse=True)
    return rows[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--top", type=int, default=5)
    args = ap.parse_args()

    # Diagnostic session: UI on for the REST API; partition coalescing
    # OFF and small scan splits so local runs show the RAW per-key
    # distribution — the one a full-size cluster would see before AQE
    # papers over it at toy scale.
    spark = get_spark(
        "skew_report",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            "spark.sql.files.maxPartitionBytes": str(128 * 1024),
        },
    )
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print(json.dumps({"error": "UI not available (session pre-existed "
                          "with spark.ui.enabled=false)"}))
        sys.exit(1)
    api = f"{ui}/api/v1"
    app_id = spark.sparkContext.applicationId

    qs = all_queries()
    names = args.queries or ["j1_broadcast_left_join"]
    out = []
    for name in names:
        seen = stage_ids(api, app_id)
        qs[name].spark(spark, args.sf).count()
        out.append(
            {
                "query": name,
                "stages": stage_report(api, app_id, args.top, skip=seen),
            }
        )
    print(json.dumps(out if len(out) > 1 else out[0]))


if __name__ == "__main__":
    main()
