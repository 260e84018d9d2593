"""Phase profile of dedup_master_keep_list_incremental (r16).

Times each phase of the ROUND-16 structure (one full-corpus store +
one pair pass, split by the ingest predicate, history CC + contracted
merge CC) by materializing it with a noop write (guide §1.4) under a
job description label, in execution order. The store tables are
persisted, so later phases read warm caches exactly as the real lane
does.

  python tools/profile_incremental.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finmapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from finmapreduce_spark.operators.checkpoints import iter_checkpoint
    from finmapreduce_spark.queries.dedup import (
        INGEST_MOD,
        _docs,
        _master_edge_union,
        connected_components,
        master_history_state,
    )

    spark = get_spark("profile_incremental", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1).count()
    sc = spark.sparkContext
    t_all0 = time.time()
    docs = _docs(spark, SF_DIR)
    phases: list[tuple[str, float]] = []

    def timed(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 2)
        phases.append((label, dt))
        print(f"{label:44s} {dt:7.2f} s", flush=True)
        sc.setJobDescription(None)
        return out

    state = master_history_state(spark, SF_DIR, docs)
    for k, v in state.items():
        timed(f"store.{k}", lambda v=v: noop(v))
    scratch: list = []
    all_edges = timed(
        "pair pass (5 lanes, warm store) + checkpoint",
        lambda: iter_checkpoint(
            _master_edge_union(spark, SF_DIR, docs, state=state, scratch=scratch)
        ),
    )
    timed(
        "store release (blocking)",
        lambda: [fr.unpersist(True) for fr in (*state.values(), *scratch)],
    )
    is_da = F.pmod(F.col("doc_a"), F.lit(INGEST_MOD)) == 0
    is_db = F.pmod(F.col("doc_b"), F.lit(INGEST_MOD)) == 0
    hist_labels = timed(
        "CC history-internal subgraph",
        lambda: connected_components(all_edges.filter(~is_da & ~is_db)),
    )
    la = hist_labels.select(F.col("doc_id").alias("doc_a"), F.col("label").alias("__la"))
    lb = hist_labels.select(F.col("doc_id").alias("doc_b"), F.col("label").alias("__lb"))
    contracted = (
        all_edges.filter(is_da | is_db)
        .join(la, "doc_a", "left")
        .join(lb, "doc_b", "left")
        .select(
            F.coalesce("__la", "doc_a").alias("doc_a"),
            F.coalesce("__lb", "doc_b").alias("doc_b"),
        )
    )
    merge_labels = timed(
        "CC contracted merge (new edges only)",
        lambda: connected_components(contracted),
    )
    losers = (
        hist_labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
        .unionByName(
            merge_labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
        )
    )
    out = docs.select("doc_id", "lang").join(losers, "doc_id", "left_anti")
    timed("final anti-join count", lambda: out.count())
    total = round(time.time() - t_all0, 2)
    print(f"{'TOTAL (phased)':44s} {total:7.2f} s")
    print(f"phase sum: {round(sum(d for _, d in phases), 2)} s")


if __name__ == "__main__":
    main()
