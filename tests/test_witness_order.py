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


def test_no_oracle_rows_scored_rows_only_not_fail():
    """A rows-only driver check (err == "no_oracle", spark rows > 0)
    is the strongest verdict possible for an oracle-less query — it
    must NOT score "fail", which would pin the query to witness
    priority slot 1 forever (VERDICT r4 #2)."""
    from tools.update_witnessed import row_verdict

    r04_row = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": 25,
        "oracle_rows": None,
        "err": "no_oracle",
    }
    assert row_verdict(r04_row) == "rows_only"
    # empty result under no-oracle still counts as a failure to witness
    assert row_verdict({**r04_row, "spark_rows": 0}) == "fail"
    # and a normal hash-exact row still passes
    assert row_verdict(
        {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    ) == "pass"


def test_rows_only_queries_not_front_loaded():
    """rows_only verdicts are 'seen' — they must rotate with the green
    pool, not occupy the failed-first head of the catalog."""
    ordered = list(all_queries())
    hist = witnessed_rounds()
    rows_only = [n for n, v in hist.items() if v["verdict"] == "rows_only"]
    if not rows_only:
        return
    failed = [n for n, v in hist.items() if v["verdict"] == "fail" and n in ordered]
    head = set(ordered[: len(failed) + len(
        [n for n in ordered if n not in hist])])
    # rows_only entries sit in the previously-seen tail, not the head,
    # unless the whole catalog is unseen.
    pos = {n: i for i, n in enumerate(ordered)}
    for n in rows_only:
        assert pos[n] >= len(failed), f"{n} front-loaded despite rows_only"


def test_witness_record_fresh_after_new_correctness_file(tmp_path):
    """End-to-end: dropping a brand-new CORRECTNESS_r99.json makes
    tools/update_witnessed fold it in; conftest's pytest_configure runs
    the same code path, so a fresh clone + fresh driver file passes
    pytest with no manual step (VERDICT r4 'Next round' #1)."""
    import json
    import shutil
    import subprocess
    import sys as _sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    clone = tmp_path / "clone"
    clone.mkdir()
    for f in repo.glob("CORRECTNESS_r*.json"):
        shutil.copy(f, clone / f.name)
    (clone / "tools").mkdir()
    shutil.copy(repo / "tools" / "update_witnessed.py", clone / "tools")
    qdir = clone / "finmapreduce_spark" / "queries"
    qdir.mkdir(parents=True)
    # brand-new driver file postdating everything committed
    (clone / "CORRECTNESS_r99.json").write_text(json.dumps({
        "zz_new_query": {"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": None},
    }))
    out = subprocess.run(
        [_sys.executable, str(clone / "tools" / "update_witnessed.py")],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    rec = json.loads((qdir / "witnessed_rounds.json").read_text())
    assert rec["zz_new_query"] == {"round": 99, "verdict": "pass"}
