"""CLI for the streaming serving-latency characterization
(finmapreduce_spark/streaming/latency.py). Prints ONE JSON line per
trigger posture so rounds can be compared like bench.py output.

Usage: python tools/stream_latency.py [--rps N] [--batches N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finmapreduce_spark.session import get_spark  # noqa: E402
from finmapreduce_spark.streaming.latency import characterize_latency  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rps", type=int, default=500)
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark("stream_latency")
    out = []
    for trigger in (None, "1 second"):
        out.append(
            characterize_latency(
                spark,
                rows_per_second=args.rps,
                n_batches=args.batches,
                trigger_interval=trigger,
            )
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
