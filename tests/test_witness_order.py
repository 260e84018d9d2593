"""Pins the data-driven catalog witness ordering.

The driver samples a ~50-entry prefix of ``all_queries()`` per round, so
ordering IS driver coverage. Invariants pinned here:

  1. every query whose last driver verdict was "fail" sits in the prefix
     (highest priority — fixes must be re-witnessed),
  2. every never-witnessed query precedes every previously-green one,
  3. previously-green queries are ordered oldest-witness-round first,
  4. any 50-prefix touches every query family (module) that has a
     not-yet-green query, so no family is starved of driver credit,
  5. the ordering is a permutation of the full catalog (nothing lost).
"""

from __future__ import annotations

import finmapreduce_spark.queries as qcat
from finmapreduce_spark.queries import all_queries, witnessed_rounds

PREFIX = 50


def _families():
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

    return {
        mod.__name__.rsplit(".", 1)[-1]: set(mod.QUERIES)
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
        )
    }


def test_failed_queries_lead_the_catalog():
    ordered = list(all_queries())
    hist = witnessed_rounds()
    failed = {n for n, v in hist.items() if v["verdict"] == "fail" and n in ordered}
    head = set(ordered[: max(len(failed), 1)])
    assert failed <= head, f"failed queries not front-loaded: {failed - head}"
    assert failed <= set(ordered[:PREFIX])


def test_never_witnessed_precede_previously_green():
    ordered = list(all_queries())
    hist = witnessed_rounds()
    pos = {n: i for i, n in enumerate(ordered)}
    never = [n for n in ordered if n not in hist]
    green = [n for n in ordered if hist.get(n, {}).get("verdict") == "pass"]
    if never and green:
        assert max(pos[n] for n in never) < min(pos[n] for n in green)


def test_green_ordered_oldest_round_first():
    ordered = list(all_queries())
    hist = witnessed_rounds()
    green_rounds = [
        hist[n]["round"] for n in ordered if hist.get(n, {}).get("verdict") == "pass"
    ]
    assert green_rounds == sorted(green_rounds)


def test_prefix_spans_families_with_pending_queries():
    ordered = list(all_queries())
    hist = witnessed_rounds()
    prefix = set(ordered[:PREFIX])
    pending = {
        fam: names
        for fam, names in _families().items()
        if any(hist.get(n, {}).get("verdict") != "pass" for n in names)
    }
    for fam, names in pending.items():
        assert names & prefix, f"family {fam} absent from the {PREFIX}-prefix"


def test_ordering_is_a_permutation():
    ordered = list(all_queries())
    assert len(ordered) == len(set(ordered))
    # Re-entry returns the same ordering (pure function of the record).
    assert ordered == list(all_queries())


def test_record_matches_driver_files(tmp_path, monkeypatch):
    # witnessed_rounds degrades to {} when the record is absent.
    monkeypatch.setattr(qcat, "_WITNESSED_PATH", tmp_path / "nope.json")
    assert witnessed_rounds() == {}
    # And all_queries still returns the full catalog.
    assert len(all_queries()) >= 130


def test_witnessed_record_is_current_with_driver_files():
    """witnessed_rounds.json must reflect every CORRECTNESS_r*.json on
    disk. When a new round's driver file lands, this fails until
    `python tools/update_witnessed.py` is re-run — the loud reminder
    that witness ordering is stale (ROADMAP round-3 note #1)."""
    import json
    import re
    from pathlib import Path

    from tools.update_witnessed import row_verdict

    repo = Path(__file__).resolve().parent.parent
    want: dict[str, dict] = {}
    # parsed-round order (r9 before r10) so newer verdicts win, as in
    # tools/update_witnessed.py
    paths = sorted(
        repo.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p.name).group(1)),
    )
    for path in paths:
        rnd = int(re.search(r"_r(\d+)\.json$", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            want[name] = {"round": rnd, "verdict": row_verdict(row)}
    assert witnessed_rounds() == want, (
        "witnessed_rounds.json is stale — run: python tools/update_witnessed.py"
    )
