#!/usr/bin/env python
"""Sequential vs top-M batched BPE at real merge counts (SCALE.md).

The batched trainer's claim is |vocab| -> |vocab|/M driver round-trips
(one corpus-wide pair-count shuffle + one bounded 64-row collect per
ROUND instead of per MERGE). The catalog query demonstrates the
mechanism at toy constants (2 rounds x M=2); this study measures the
claim at >= 64 effective merges:

    PYTHONPATH=. python tools/bpe_batch_study.py --merges 64 --batch 8

Prints one JSON line per arm: wall seconds, driver round-trips
(= corpus-count shuffles = collects), merges produced, and the overlap
between the two arms' merge sets (batched selection may legitimately
diverge after round one -- new pairs created by a merge never compete
within its own round; full-closure skips can also leave a round short).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from finmapreduce_spark.queries.training import (
        _bpe_train,
        _bpe_train_batched,
    )
    from finmapreduce_spark.session import get_spark

    spark = get_spark("bpe-batch-study")
    spark.range(1).count()  # warm up

    t0 = time.time()
    seq_rows, toks = _bpe_train(spark, args.sf_dir, n_merges=args.merges)
    toks.unpersist()
    seq = {
        "arm": "sequential",
        "wall_sec": round(time.time() - t0, 2),
        "round_trips": args.merges,  # one count shuffle + collect per merge
        "merges": len(seq_rows),
    }
    print(json.dumps(seq))

    rounds = (args.merges + args.batch - 1) // args.batch
    t0 = time.time()
    bat_rows, toks = _bpe_train_batched(
        spark, args.sf_dir, rounds=rounds, batch=args.batch
    )
    toks.unpersist()
    bat = {
        "arm": f"batched_m{args.batch}",
        "wall_sec": round(time.time() - t0, 2),
        "round_trips": rounds,  # one count shuffle + 64-row collect per round
        "merges": len(bat_rows),
    }
    print(json.dumps(bat))

    seq_pairs = {p for _, p, _m, _c in seq_rows}
    bat_pairs = {p for _, p, _m, _c in bat_rows}
    print(
        json.dumps(
            {
                "arm": "agreement",
                "common_merges": len(seq_pairs & bat_pairs),
                "seq_only": len(seq_pairs - bat_pairs),
                "bat_only": len(bat_pairs - seq_pairs),
                "speedup": round(seq["wall_sec"] / max(bat["wall_sec"], 1e-9), 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
