"""Binary-column parquet asset store — the multimodal data model.

The task brief's multimodal contract is "image/audio/video as opaque
``binary`` columns with typed metadata". This module materializes the
deterministic synthetic asset corpus (operators/multimodal.py —
real PPM/WAV/Y4M containers) ONCE per scale factor into a parquet
store partitioned by ``kind``, and the multimodal catalog queries
read assets from it like any production pipeline reads from object
storage:

- ``kind=image/`` etc. partition directories → a decode query that
  wants only images prunes the audio/video directories at planning
  time (never opened);
- ``asset_id`` min/max footer stats → point/range asset lookups skip
  row groups;
- payload bytes cross the JVM→Python boundary exactly once, into the
  decode Arrow stage — the synth stage is a one-time write cost, not
  a per-query tax (before this store, every multimodal query paid
  payload synthesis + a second Arrow hop per evaluation).

The store is content-addressed by (sf_dir, schema version): bump
``STORE_VERSION`` whenever the synth formulas change so stale caches
self-invalidate. Writes go to a tmp directory then rename into place,
so a crashed writer never leaves a half-store where readers look; a
concurrent double-write loses the rename race harmlessly.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

# Bump when operators/multimodal.py synth formulas or the store
# schema change — the tag makes old caches unreachable.
STORE_VERSION = 1

ASSET_COLUMNS = (
    "asset_id",
    "kind",
    "payload",
    "mime",
    "width",
    "height",
    "duration_ms",
)


def _data_fingerprint(sf_dir: str, table: str) -> str:
    """mtime+size of the source parquet, so a REGENERATED testdata
    dir self-invalidates the cache even when the path is unchanged."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(p)
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "absent"


def asset_store_path(sf_dir: str) -> str:
    tag = hashlib.md5(
        f"{sf_dir}|v{STORE_VERSION}|{_data_fingerprint(sf_dir, 'documents')}".encode()
    ).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"fmr_asset_store_{tag}")


def materialize_once(path: str, write_fn) -> str:
    """Crash/race-safe write-once: if ``path`` lacks a _SUCCESS
    marker, call ``write_fn(tmp_path)`` and rename into place. A
    concurrent double-write loses the rename race harmlessly; a
    crashed writer leaves only an orphan tmp dir, never a half-store
    where readers look."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    if os.path.exists(path):
        # marker-less target (crashed/partial/foreign dir): self-heal
        # by removing it, otherwise the rename below fails forever
        shutil.rmtree(path, ignore_errors=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    write_fn(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        # lost a concurrent-writer race (or the path appeared some
        # other way): keep the winner, drop our copy
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            raise
    return path


def materialize_assets(spark: SparkSession, sf_dir: str) -> str:
    """Write the asset corpus for ``sf_dir`` if absent; return path."""

    def write(tmp: str) -> None:
        from finmapreduce_spark.operators.multimodal import (
            fake_assets_from_documents,
        )
        from finmapreduce_spark.session import read_table

        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        (
            fake_assets_from_documents(docs)
            .repartition(spark.sparkContext.defaultParallelism, "asset_id")
            .write.mode("overwrite")
            .partitionBy("kind")
            .parquet(tmp)
        )

    return materialize_once(asset_store_path(sf_dir), write)


def read_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset DataFrame from the store (materializing on first use).

    Column order is normalized (partition discovery appends ``kind``);
    types round-trip: payload stays ``binary``, asset_id ``long``.
    """
    path = materialize_assets(spark, sf_dir)
    return spark.read.parquet(path).select(*ASSET_COLUMNS)
