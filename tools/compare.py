"""Local mimic of the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle at sf0.01,
compares row count, sorted column names, and an order-insensitive
value multiset. Exact comparison (no float tolerance) so any
engine-level numeric divergence shows up here before the driver sees
it.

Usage: python tools/compare.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# FMR_COMPARE_SF_DIR points the whole sweep at another table dir —
# e.g. the adversarial-corpus build — turning the totality check into
# a full value-parity check on pathological data.
SF_DIR = os.environ.get("FMR_COMPARE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(norm_cell(r[i]) for i in order) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


def multiset_diff(cs, cd):
    """Rows present in one engine's canonical multiset but not the
    other's. This is the r12/r13 lesson applied: zip over two SORTED
    lists misaligns every row after the first divergence, so the old
    "first diffs" display showed unrelated doc rows side by side and
    masked which row actually differed (VERDICT r13 What's-wrong #1)."""
    from collections import Counter

    a, b = Counter(cs), Counter(cd)
    only_s = list((a - b).elements())
    only_d = list((b - a).elements())
    return only_s, only_d


def dump_failure(name, scols, cs, dcols, cd, only_s, only_d, rerun_verdict):
    """Persist the full evidence for a value mismatch so a transient
    (contention-correlated) flake is root-causable after the fact."""
    import json

    # Dumps live under a gitignored subdirectory: repeated failing
    # sweeps used to scatter ~40k-row JSON files across the repo root
    # next to tracked round artifacts, one `git add .` away from being
    # committed (round-14 advice).
    dump_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "compare_failures"
    )
    os.makedirs(dump_dir, exist_ok=True)
    path = os.path.join(
        dump_dir, f"compare_fail_{name}_{os.getpid()}.json"
    )
    cap = 20000
    payload = {
        "query": name,
        "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "loadavg": list(os.getloadavg()),
        "sf_dir": SF_DIR,
        "rerun_verdict": rerun_verdict,
        "spark_cols_sorted": sorted(scols),
        "duck_cols_sorted": sorted(dcols),
        "only_in_spark": [[str(x) for x in r] for r in only_s[:200]],
        "only_in_duck": [[str(x) for x in r] for r in only_d[:200]],
        "spark_rows": [[str(x) for x in r] for r in cs[:cap]],
        "duck_rows": [[str(x) for x in r] for r in cd[:cap]],
    }
    with open(os.path.abspath(path), "w") as f:
        json.dump(payload, f, indent=1)
    return os.path.abspath(path)


def main():
    # Exact driver mimicry: import the entry module by path and run
    # its queries() on a PLAIN SparkSession (builder defaults, none of
    # get_spark's confs) — so conf-dependence bugs (the r01 zorder
    # class) surface here before the driver sees them. Run from any
    # cwd; the entry shim ships the package zip to workers.
    import importlib.util

    from pyspark.sql import SparkSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec_ = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(repo, "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(entry_mod)
    # FMR_COMPARE_MASTER / FMR_COMPARE_SHUFFLE let CI re-run the whole
    # sweep under adversarial parallelism (e.g. local[3] with 7
    # shuffle partitions): any query whose result depends on partition
    # count or row order fails the exact compare — a determinism
    # certification on top of the correctness one.
    builder = SparkSession.builder.master(
        os.environ.get("FMR_COMPARE_MASTER", "local[8]")
    )
    if "FMR_COMPARE_SHUFFLE" in os.environ:
        builder = builder.config(
            "spark.sql.shuffle.partitions", os.environ["FMR_COMPARE_SHUFFLE"]
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    con = duck_con()
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    n_pass = n_fail = n_nooracle = 0
    for name in wanted:
        fn = qs[name]
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        # queries that persist intermediates (trainers, the simhash
        # band table) pin them behind the collected plan — clear per
        # query so a long sweep doesn't accumulate storage pressure
        # (same discipline as bench.py)
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"NOORACLE {name}: rows={len(srows)} ({t_spark:.1f}s)")
            n_nooracle += 1
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if ok:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            if cs != cd:
                ok = False
                only_s, only_d = multiset_diff(cs, cd)
                # Immediately re-run BOTH engines on the same input:
                # a pass here proves the divergence was transient
                # (torn read / contention), a repeat pins it as a
                # real, reproducible engine disagreement.
                rerun = "not-run"
                try:
                    r_sdf = fn(spark, SF_DIR)
                    r_rows = [tuple(r) for r in r_sdf.collect()]
                    spark.catalog.clearCache()
                    r_res = con.execute(oracles[name])
                    r_drows = r_res.fetchall()
                    r_cs = canon(r_rows, r_sdf.columns)
                    r_cd = canon(r_drows, [d[0] for d in r_res.description])
                    if r_cs == r_cd:
                        rerun = (
                            "TRANSIENT (immediate rerun matched; "
                            f"spark_changed={r_cs != cs} "
                            f"duck_changed={r_cd != cd})"
                        )
                    else:
                        rerun = "PERSISTENT (immediate rerun still differs)"
                except Exception as e:  # noqa: BLE001
                    rerun = f"rerun errored: {type(e).__name__}: {e}"
                dump = dump_failure(
                    name, scols, cs, dcols, cd, only_s, only_d, rerun
                )
                msgs.append(
                    f"values differ; only_in_spark={only_s[:3]} "
                    f"only_in_duck={only_d[:3]}; rerun={rerun}; "
                    f"loadavg={os.getloadavg()}; dump={dump}"
                )
        if ok:
            print(f"PASS {name}: rows={len(srows)} ({t_spark:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nooracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
