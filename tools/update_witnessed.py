#!/usr/bin/env python
"""Regenerate queries/witnessed_rounds.json from driver CORRECTNESS files.

Run after each round's CORRECTNESS_r{N}.json lands:

    python tools/update_witnessed.py

Later rounds overwrite earlier verdicts per query name, so the record
always holds each query's LATEST driver round + verdict. Catalog
witness ordering (finmapreduce_spark/queries/__init__.py) consumes it:
failed-last first, never-witnessed next, oldest-green last.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "finmapreduce_spark" / "queries" / "witnessed_rounds.json"


def row_verdict(row: dict) -> str:
    # Queries with no DuckDB oracle (oracle_sql omits them by design,
    # e.g. dedup_ml_minhash_lsh's seeded Spark-ML hash coefficients)
    # get a rows-only driver check: err == "no_oracle" with a
    # non-empty Spark result is the strongest verdict possible, not a
    # failure. Scoring it "fail" would pin the query to witness
    # priority slot 1 forever and burn a driver row every round.
    if row.get("err") == "no_oracle":
        return "rows_only" if (row.get("spark_rows") or 0) > 0 else "fail"
    ok = (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        # hash_match is None for rows-only (no-oracle) checks.
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )
    return "pass" if ok else "fail"


def main() -> int:
    # order by the PARSED round number, not the filename: 'r10' sorts
    # lexicographically before 'r9', which would let an older round's
    # verdict overwrite a newer fix
    def round_of(path) -> int:
        m = re.search(r"_r(\d+)\.json$", path.name)
        return int(m.group(1)) if m else 0

    files = sorted(REPO.glob("CORRECTNESS_r*.json"), key=round_of)
    if not files:
        print("no CORRECTNESS_r*.json files found", file=sys.stderr)
        return 1
    record: dict[str, dict] = {}
    for path in files:
        rnd = round_of(path)
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            record[name] = {"round": rnd, "verdict": row_verdict(row)}
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    fails = sorted(n for n, v in record.items() if v["verdict"] == "fail")
    print(f"wrote {OUT.relative_to(REPO)}: {len(record)} witnessed, "
          f"{len(fails)} open fails: {fails}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
