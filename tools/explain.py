"""Dump the formatted physical plan for any catalog query.

  PYTHONPATH=/root/repo python tools/explain.py q5_regional_revenue [sf_dir]

The development loop the repo's plan tests grew out of: run after
touching a query, read for BroadcastHashJoin / PushedFilters /
WholeStageCodegen spans / Exchange count, and fix the plan before
trusting the timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finmapreduce_spark.queries import all_queries
from finmapreduce_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2:
        qs = all_queries()
        print("usage: explain.py <query> [sf_dir]\navailable:")
        for n in sorted(qs):
            print(" ", n)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("explain")
    df = all_queries()[name].spark(spark, sf_dir)
    mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    print(df._jdf.queryExecution().explainString(mode))


if __name__ == "__main__":
    main()
