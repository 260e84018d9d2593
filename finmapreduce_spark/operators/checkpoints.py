"""Lineage truncation for iterative loops, cluster-safe.

Every iterative operator here (connected components' star rounds,
PageRank, batched BPE) must cut its logical plan back to a leaf every
round or Catalyst's analysis itself blows up (lineage grows
exponentially through self-referencing unions).  Locally the right
tool is ``localCheckpoint()`` — executor-local MEMORY_AND_DISK blocks,
no HDFS round-trip, and ``local[]`` has no executor loss to survive.

On a real cluster that trade-off inverts: localCheckpoint blocks live
ONLY on the executors that computed them, so one executor loss during
an hours-long 100-TB CC run makes the truncated lineage unrecoverable
and kills the job.  Setting ``FMR_CHECKPOINT_DIR`` (any Hadoop-visible
path: hdfs://, s3a://, or a shared mount) switches every loop to
reliable ``checkpoint()`` against that directory — each round's state
is replicated to fault-tolerant storage and any executor can rebuild.

The session factory enables
``spark.cleaner.referenceTracking.cleanCheckpoints`` so reliable
checkpoint files are deleted by the ContextCleaner once the driver
drops the RDD handle — the same lifecycle the loops already manage for
local blocks (each round releases the previous round's snapshot).
"""

from __future__ import annotations

import gc
import os
import warnings

from pyspark.sql import DataFrame

CHECKPOINT_DIR_ENV = "FMR_CHECKPOINT_DIR"

# Attribute stamped onto checkpointed DataFrames so the loop can later
# release exactly the blocks this checkpoint created (and nothing else).
_CKPT_IDS_ATTR = "_fmr_ckpt_rdd_ids"


def checkpoint_dir() -> str | None:
    """The configured reliable-checkpoint directory, or None (use
    localCheckpoint)."""
    return os.environ.get(CHECKPOINT_DIR_ENV) or None


def _persistent_rdd_ids(sc) -> set[int]:
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — the per-round
    checkpoint call every iterative loop routes through.

    Default: ``localCheckpoint()`` (eager, executor-local blocks).
    With ``FMR_CHECKPOINT_DIR`` set: reliable ``checkpoint()`` (eager)
    into that directory, surviving executor loss.  The checkpoint dir
    is installed on the SparkContext on first use.

    In local mode the returned DataFrame carries the ids of the
    persistent RDDs the checkpoint created, so
    :func:`release_iter_checkpoint` can free those blocks
    synchronously once the loop rebinds past the snapshot.  The id
    capture diffs the context's persistent-RDD registry around the
    checkpoint call, which is only attribution-safe when no OTHER
    thread persists RDDs concurrently — true for every single-threaded
    iterative loop here.
    """
    ckdir = checkpoint_dir()
    sc = df.sparkSession.sparkContext
    if not ckdir:
        before = _persistent_rdd_ids(sc)
        out = df.localCheckpoint()
        out._fmr_ckpt_rdd_ids = frozenset(_persistent_rdd_ids(sc) - before)
        return out
    # setCheckpointDir is idempotent for the same path; only install
    # when unset so an operator-provided dir (e.g. set by a notebook)
    # is never silently replaced.
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(ckdir)
    out = df.checkpoint(eager=True)
    # Reliable checkpoints hold FILES, not storage blocks; the
    # ContextCleaner deletes them on driver GC of the RDD handle
    # (cleanCheckpoints=true in the session factory), so there is
    # nothing to unpersist by id here.
    out._fmr_ckpt_rdd_ids = frozenset()
    return out


def release_iter_checkpoint(df: DataFrame | None) -> int:
    """BLOCKING release of the checkpoint blocks ``df`` pinned.

    Rebinding a loop variable orphans the previous round's snapshot,
    but its MEMORY_AND_DISK blocks free only after Python GC drops the
    py4j handle AND the async ContextCleaner gets around to the
    fire-and-forget removal message.  In a tight loop over a multi-GB
    edge set nothing forces either, so every round's full table stays
    resident — the round-14 100× study filled an 80 GB scratch volume
    that way (ENOSPC), and the round-14 bench close record showed the
    same disease across trials (monotone 10→15→25 s CC lane).  A
    per-round ``gc.collect()`` (the round-14 fix) makes the removal
    *eligible*, not *done*; unpersisting the tracked RDD ids with
    ``blocking=True`` makes it synchronous: when this returns, the
    blocks are gone.

    Only call after the successor state is eagerly materialized —
    checkpointing truncated the lineage, so these blocks are the
    snapshot's ONLY copy.

    In reliable mode (no tracked ids) this falls back to a
    ``gc.collect()`` so the ContextCleaner can delete the now
    unreferenced checkpoint files.  Returns the number of RDDs
    released.
    """
    if df is None:
        return 0
    ids = getattr(df, _CKPT_IDS_ATTR, None)
    if not ids:
        if ids is not None:  # reliable mode: files, not blocks
            gc.collect()
        return 0
    released = 0
    try:
        jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(True)
                released += 1
    except Exception as e:  # pragma: no cover - py4j hiccup
        # Never fail a correct computation over cleanup; degrade to
        # the async best-effort path.
        warnings.warn(f"checkpoint release fell back to gc: {e}")
        gc.collect()
    df._fmr_ckpt_rdd_ids = frozenset()
    return released


def release_all_persistent_rdds(spark) -> int:
    """BLOCKING release of EVERY persistent RDD on the context —
    including localCheckpoint blocks, which
    ``spark.catalog.clearCache()`` does NOT touch (the cache manager
    only tracks cached *queries*).  Safe only at a quiesce point where
    no live DataFrame will re-read a truncated-lineage RDD: between a
    staged lane's parquet write and the next lane, or between bench
    trials.  Returns the number of RDDs released."""
    released = 0
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in jmap.values():
            jrdd.unpersist(True)
            released += 1
    except Exception as e:  # pragma: no cover - py4j hiccup
        warnings.warn(f"persistent-RDD release fell back to gc: {e}")
        gc.collect()
    return released
