"""Structured Streaming serving mode (SURVEY §2.9 extension).

The reference's only "streaming" surface is the webapp's
one-request-at-a-time ``process_single_qa_async``
(webapp/backend/api/endpoints.py:273). The Spark-native serving
analogue: ``readStream`` on a landing directory of QA requests →
the same batch DAG inside ``foreachBatch`` (exactly-once per
micro-batch) → results sink. Plus the temporal surface the reference
lacks: watermarked tumbling-window usage/rate rollups over an events
stream (the batch twin is queries/relational.py:hourly_event_rollup,
which the DuckDB oracle checks).

Everything here reuses the batch plan objects — one definition of the
DAG, two execution modes. That is the point of expressing the
pipeline declaratively: Structured Streaming runs the same logical
plan incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Landing-directory request schema (webapp upload surface S10)
REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), True),
        T.StructField("submitted_at", T.TimestampType(), True),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_request_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """File-source stream of JSON QA requests (one file per upload,
    the S10 webapp surface). maxFilesPerTrigger bounds micro-batch
    size so LLM concurrency stays within the rate budget."""
    return (
        spark.readStream.schema(REQUEST_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(landing_dir)
    )


def serve_mapreduce(
    requests: DataFrame,
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cfg=None,
):
    """foreachBatch serving: each micro-batch of QA requests runs the
    identical batch DAG (plans/mapreduce.py) and appends JSON results.

    foreachBatch gives exactly-once per epoch with the checkpoint; the
    LLM stages stay idempotent via the deterministic request key
    (qa_id), so a replayed epoch re-emits identical rows.
    """
    from finmapreduce_spark.plans.mapreduce import MapReduceConfig, run_mapreduce

    cfg = cfg or MapReduceConfig()

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stages = run_mapreduce(batch_df.drop("submitted_at"), docs, cfg)
        (
            stages["answers"]
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .json(out_dir)
        )

    return (
        requests.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def windowed_event_rollup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window rollup over a (possibly late)
    event stream — 1-hour windows per event_type.

    In append mode a window emits once its watermark passes: late
    events within the watermark still count; older ones drop. The
    batch twin (hourly_event_rollup) is oracle-checked; streaming
    equivalence is asserted in tests by running this same plan over a
    file stream and comparing to the batch result.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession, df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming DataFrame to completion against a memory sink
    (test/smoke harness; availableNow processes all pending input).

    Note on modes: in ``append`` a watermarked window only emits once
    the watermark passes it — after the final input there is no later
    event to advance the watermark, so the trailing window(s) stay
    pending forever. Use ``complete`` when the test needs every
    window materialized.
    """
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
