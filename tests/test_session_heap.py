"""Regression pin for the round-9 default-environment OOM.

`pytest tests/` with NO env vars must survive the full 168-query
catalog sweep in one session-scoped SparkSession. The sweep's
legitimately-pinned blocks (persisted ANN serve indexes, CC-round
localCheckpoints) overflowed Spark's 1 GiB default driver heap
(round-9 verdict #1: deterministic java.lang.OutOfMemoryError at
~stage 2200, 349 cascade failures). get_spark now defaults
spark.driver.memory to 6g when SPARK_GRAFT_DRIVER_MEM is unset; this
pins that the conf is BOTH set and actually honored by the launched
JVM (spark.driver.memory is launch-time-only — a conf set after
getOrCreate of an existing session is silently inert, which is
exactly the failure this test exists to catch).
"""

from __future__ import annotations

import re

_MIN_HEAP_BYTES = 3 * 1024**3  # 6g requested; Xmx-to-maxMemory slack


def _to_bytes(mem: str) -> int:
    m = re.fullmatch(r"(\d+)([kmgt]?)b?", mem.strip().lower())
    assert m, f"unparseable spark.driver.memory: {mem!r}"
    return int(m.group(1)) * 1024 ** {"": 0, "k": 1, "m": 2, "g": 3, "t": 4}[
        m.group(2)
    ]


def test_driver_heap_conf_meets_catalog_requirement(spark):
    conf = spark.conf.get("spark.driver.memory")
    assert _to_bytes(conf) >= 4 * 1024**3, (
        f"test session requested only {conf}; the catalog sweep needs >=4g "
        "(see finmapreduce_spark/session.py driver-heap default)"
    )


def test_driver_jvm_actually_got_the_heap(spark):
    # Runtime.maxMemory() reflects the real -Xmx the JVM launched with;
    # survivor-space accounting makes it read a bit under Xmx.
    max_mem = int(
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    )
    assert max_mem >= _MIN_HEAP_BYTES, (
        f"driver JVM maxMemory {max_mem / 1024**3:.2f} GiB < "
        f"{_MIN_HEAP_BYTES / 1024**3:.0f} GiB — spark.driver.memory was set "
        "too late to take effect (another session already owned the JVM?)"
    )
