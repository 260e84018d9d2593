"""Phase profile of dedup_master_keep_list_staged (r16 measure-first).

Replays the staged lane's exact sequence with a wall clock around each
lane write and the CC phase.

  python tools/profile_staged.py [sf_dir]
"""

from __future__ import annotations

import gc as _gc
import os
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finmapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> None:
    from finmapreduce_spark.operators.checkpoints import (
        release_all_persistent_rdds,
    )
    from finmapreduce_spark.queries.dedup import (
        _content_hash_keepers,
        _docs,
        connected_components,
        dedup_lsh_pairs_grid,
        dedup_semantic_verify,
        dedup_simhash_pairs_grid,
        exact_substring_pairs,
        with_shingles,
    )

    spark = get_spark("profile_staged", extra_conf={"spark.ui.enabled": "true"})
    spark.range(1).count()
    t_all0 = time.time()
    stage_dir = tempfile.mkdtemp(prefix="fmr_prof_stage_")
    docs = _docs(spark, SF_DIR)

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        print(f"{label:38s} {time.time() - t0:7.2f} s", flush=True)
        return out

    def exact_lane():
        hashed, keepers = _content_hash_keepers(docs)
        return (
            hashed.join(keepers, "content_hash")
            .filter(F.col("doc_id") != F.col("keeper"))
            .select(
                F.col("keeper").alias("doc_a"), F.col("doc_id").alias("doc_b")
            )
        )

    shingled = with_shingles(docs).persist()
    scratch: list = []
    lanes = [
        ("lsh", lambda: dedup_lsh_pairs_grid(spark, SF_DIR, shingled=shingled, scratch=scratch)),
        ("simhash", lambda: dedup_simhash_pairs_grid(spark, SF_DIR, shingled=shingled, scratch=scratch)),
        ("semantic", lambda: dedup_semantic_verify(spark, SF_DIR, shingled=shingled, scratch=scratch)),
    ]
    for name, build in lanes:
        timed(
            f"lane {name} (build+write)",
            lambda b=build, n=name: b()
            .select("doc_a", "doc_b")
            .write.mode("overwrite")
            .parquet(f"{stage_dir}/{n}"),
        )
        for fr in scratch:
            fr.unpersist(True)
        scratch.clear()
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
    timed("unpersist shingled", lambda: shingled.unpersist(True))
    for name, build in [
        ("exact", exact_lane),
        ("substring", lambda: exact_substring_pairs(docs)),
    ]:
        timed(
            f"lane {name} (build+write)",
            lambda b=build, n=name: b()
            .select("doc_a", "doc_b")
            .write.mode("overwrite")
            .parquet(f"{stage_dir}/{n}"),
        )
        spark.catalog.clearCache()
        release_all_persistent_rdds(spark)
        _gc.collect()
        spark.sparkContext._jvm.System.gc()
    pair_tables = [
        spark.read.parquet(f"{stage_dir}/{n}")
        for n in ["lsh", "simhash", "semantic", "exact", "substring"]
    ]
    edges = reduce(lambda a, b: a.unionByName(b), pair_tables).distinct()
    labels = timed("CC (from parquet)", lambda: connected_components(edges))
    losers = labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
    out = docs.select("doc_id", "lang").join(losers, "doc_id", "left_anti")
    timed("final anti-join count", lambda: out.count())
    print(f"{'TOTAL':38s} {time.time() - t_all0:7.2f} s")


if __name__ == "__main__":
    main()
