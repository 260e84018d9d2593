"""Driver-contract hardening: __spark_entry__ must work when imported
from an UNKNOWN cwd with a plain SparkSession (exactly how the grading
driver runs it). The driver process gets the package via the entry
file's sys.path insert — but Python WORKERS spawned by executors
inherit neither that nor the driver's cwd, so any mapInPandas /
pandas_udf stage dies with ModuleNotFoundError unless the entry file
ships the package to workers (addPyFile). Found by a full plain-
session sweep; this pins the fix.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_udf_query_survives_foreign_cwd(tmp_path):
    script = textwrap.dedent(
        f"""
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "__spark_entry__", {os.path.join(REPO, "__spark_entry__.py")!r})
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[2]").getOrCreate()
        # improve_questions runs a mapInPandas LLM stage — the worker
        # must import finmapreduce_spark to deserialize the UDF.
        n = mod.queries()["improve_questions"](
            spark, "/root/testdata/sf0.001").count()
        assert n > 0, n
        print("FOREIGN_CWD_OK", n)
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # decidedly not the repo
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": ""},  # no accidental repo path
    )
    assert "FOREIGN_CWD_OK" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]
