"""Phase profile of dedup_master_keep_list_incremental (r16 measure-first).

Times each phase by materializing it with a noop write (guide §1.4)
under a job description label, in the order the real query executes.
Because the state tables are persisted, later phases read warm caches
exactly as the real lane does; the phase walls therefore decompose the
lane's wall (modulo the symmetric-union recompute inside
connected_components, which the CC phases absorb — noted inline).

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
    from finmapreduce_spark.queries.dedup import (
        INGEST_MOD,
        _docs,
        _master_cross_edges,
        _master_edge_union,
        connected_components,
        master_history_state,
    )

    spark = get_spark("profile_incremental", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1).count()
    sc = spark.sparkContext
    t_all0 = time.time()
    docs = _docs(spark, SF_DIR)
    delta = docs.filter(F.pmod("doc_id", F.lit(INGEST_MOD)) == 0)
    hist = docs.filter(F.pmod("doc_id", F.lit(INGEST_MOD)) != 0)
    phases: list[tuple[str, float]] = []

    def timed(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 2)
        phases.append((label, dt))
        print(f"{label:38s} {dt:7.2f} s", flush=True)
        sc.setJobDescription(None)
        return out

    state_h = master_history_state(spark, SF_DIR, hist)
    state_d = master_history_state(spark, SF_DIR, delta)
    for k, v in state_h.items():
        timed(f"state_h.{k}", lambda v=v: noop(v))
    for k, v in state_d.items():
        timed(f"state_d.{k}", lambda v=v: noop(v))

    hist_edges = _master_edge_union(spark, SF_DIR, hist, state=state_h)
    timed("hist_edges (noop, warm state)", lambda: noop(hist_edges))
    hist_labels = timed(
        "CC1 hist (incl. sym recompute)",
        lambda: connected_components(hist_edges),
    )
    timed("hist_labels count", lambda: hist_labels.count())

    delta_edges = _master_edge_union(spark, SF_DIR, delta, state=state_d)
    timed("delta_edges (noop)", lambda: noop(delta_edges))
    cross_edges = _master_cross_edges(
        spark, SF_DIR, delta, hist, state=state_h, delta_state=state_d
    )
    timed("cross_edges (noop)", lambda: noop(cross_edges))

    hist_star = hist_labels.filter(F.col("doc_id") != F.col("label")).select(
        F.col("label").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    edges = (
        hist_star.unionByName(delta_edges).unionByName(cross_edges).distinct()
    )
    labels = timed(
        "CC2 full (incl. edge recompute)", lambda: connected_components(edges)
    )
    losers = labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
    out = docs.select("doc_id", "lang").join(losers, "doc_id", "left_anti")
    timed("final anti-join count", lambda: out.count())

    total = round(time.time() - t_all0, 2)
    print(f"{'TOTAL (phased)':38s} {total:7.2f} s")
    print(f"phase sum: {round(sum(d for _, d in phases), 2)} s")


if __name__ == "__main__":
    main()
