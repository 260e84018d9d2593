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

import os

from pyspark.sql import DataFrame

CHECKPOINT_DIR_ENV = "FMR_CHECKPOINT_DIR"


def checkpoint_dir() -> str | None:
    """The configured reliable-checkpoint directory, or None (use
    localCheckpoint)."""
    return os.environ.get(CHECKPOINT_DIR_ENV) or None


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage — the per-round
    checkpoint call every iterative loop routes through.

    Default: ``localCheckpoint()`` (eager, executor-local blocks).
    With ``FMR_CHECKPOINT_DIR`` set: reliable ``checkpoint()`` (eager)
    into that directory, surviving executor loss.  The checkpoint dir
    is installed on the SparkContext on first use.
    """
    ckdir = checkpoint_dir()
    if not ckdir:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    # setCheckpointDir is idempotent for the same path; only install
    # when unset so an operator-provided dir (e.g. set by a notebook)
    # is never silently replaced.
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(ckdir)
    return df.checkpoint(eager=True)
