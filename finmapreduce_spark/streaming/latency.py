"""Serving-latency characterization for the streaming surface
(ROADMAP #4 — the number the batch bench can't give you).

The reference serves one QA at a time over HTTP (~seconds of LLM
latency, webapp/backend/api/endpoints.py:183-304); its engine overhead
is invisible. Here the analogue is micro-batch serving: rate source →
request-shaped rows → the JVM-side analysis surface (token count +
quality score, the cheap half of the serve path) → foreachBatch sink.
Two latency families are reported:

- **row latency**: sink wall-clock minus the rate-source event
  timestamp, i.e. end-to-end time a request waits from generation to
  being answered in a committed batch (includes trigger scheduling).
- **trigger execution**: Spark's own per-batch ``durationMs.
  triggerExecution`` from query progress — pure engine time.

At cluster scale the same harness runs against a Kafka source
unchanged; the rate source isolates engine overhead from broker I/O.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _percentile(xs: list[float], p: float) -> float:
    if not xs:
        return float("nan")
    s = sorted(xs)
    i = min(len(s) - 1, int(round(p * (len(s) - 1))))
    return s[i]


def request_shaped_stream(spark: SparkSession, rows_per_second: int) -> DataFrame:
    """Rate source dressed as QA requests, then pushed through the
    JVM-side text-analysis expressions the serve path runs before any
    LLM call (whole-stage-codegen territory — no Python per row)."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    question = F.concat(
        F.lit("what is the revenue impact of item "),
        F.col("value").cast("string"),
        F.lit(" on segment performance?"),
    )
    return (
        src.withColumn("request_id", F.col("value"))
        .withColumn("question", question)
        .withColumn("n_tokens", F.size(F.split(F.col("question"), r"\s+")))
        .withColumn(
            "quality",
            F.length("question")
            / (F.lit(1.0) + F.size(F.split(F.col("question"), r"\s+"))),
        )
        .select("request_id", "timestamp", "question", "n_tokens", "quality")
    )


def characterize_latency(
    spark: SparkSession,
    rows_per_second: int = 200,
    n_batches: int = 8,
    trigger_interval: str | None = None,
    timeout_s: float = 60.0,
) -> dict[str, Any]:
    """Run the serving stream until ``n_batches`` non-empty batches
    commit; return row-latency and trigger-execution percentiles.

    ``trigger_interval=None`` = as-fast-as-possible micro-batches (the
    low-latency serving posture); pass e.g. "1 second" to measure the
    batching-for-throughput posture.
    """
    stream = request_shaped_stream(spark, rows_per_second)
    lat: list[dict[str, float]] = []

    def sink(df: DataFrame, epoch: int) -> None:
        row = df.agg(
            F.count("*").alias("n"), F.min("timestamp").alias("oldest")
        ).collect()[0]
        if row["n"]:
            lat.append(
                {
                    "epoch": epoch,
                    "rows": row["n"],
                    # oldest row in the batch → worst-case wait
                    "row_latency_s": time.time() - row["oldest"].timestamp(),
                }
            )

    writer = stream.writeStream.foreachBatch(sink)
    if trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    q = writer.start()
    deadline = time.time() + timeout_s
    try:
        while len(lat) < n_batches and q.isActive and time.time() < deadline:
            time.sleep(0.1)
        progress = [p for p in q.recentProgress if p.get("numInputRows", 0)]
    finally:
        q.stop()

    rows_lat = [x["row_latency_s"] for x in lat]
    trig_ms = [
        float(p["durationMs"]["triggerExecution"])
        for p in progress
        if "durationMs" in p and "triggerExecution" in p["durationMs"]
    ]
    return {
        "rows_per_second": rows_per_second,
        "trigger": trigger_interval or "as-fast-as-possible",
        "batches": len(lat),
        "rows_total": int(sum(x["rows"] for x in lat)),
        "row_latency_s": {
            "p50": round(_percentile(rows_lat, 0.5), 3),
            "p95": round(_percentile(rows_lat, 0.95), 3),
            "max": round(max(rows_lat), 3) if rows_lat else None,
        },
        "trigger_exec_ms": {
            "p50": round(_percentile(trig_ms, 0.5), 1),
            "p95": round(_percentile(trig_ms, 0.95), 1),
        },
    }
