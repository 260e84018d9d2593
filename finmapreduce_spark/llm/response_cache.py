"""Cross-run LLM response cache (ROADMAP #1; SURVEY §4's
"LLM-call deduplication ... explicit dropDuplicates + response-cache
table").

The in-worker request-key cache (client.py) dies with the executor;
this table makes paid calls idempotent ACROSS runs: before the
mapInPandas stage, prompts left-anti join the cache and only misses
hit the API; fresh responses append back. Re-running a failed or
extended job re-pays nothing for prompts already answered.

Layout: parquet at ``cache_dir`` with
(key string, content string, input_tokens long, output_tokens long) —
key = md5(kind || '|' || prompt). Append-only; duplicate keys are
harmless (reader dedupes keep-first) and avoid write coordination.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CACHE_SCHEMA = "key string, content string, input_tokens long, output_tokens long"


def _key(kind: str, prompt_col):
    return F.md5(F.concat(F.lit(kind), F.lit("|"), prompt_col))


def _load_cache(spark: SparkSession, cache_dir: str) -> DataFrame:
    if os.path.isdir(cache_dir) and any(
        f.endswith(".parquet") for f in os.listdir(cache_dir)
    ):
        return (
            spark.read.parquet(cache_dir)
            .dropDuplicates(["key"])
        )
    return spark.createDataFrame([], CACHE_SCHEMA)


def map_stage_cached(chunks: DataFrame, cfg, cache_dir: str) -> DataFrame:
    """map_stage with the response-cache table in front.

    Hits skip the LLM entirely (content served from parquet with
    cache_read accounting: input_tokens carried, output served);
    misses run the normal Arrow/asyncio stage and append to the cache.
    Result is identical to an uncached run (same MAP_OUT schema and
    values) because the mock/real client is deterministic per prompt.
    """
    from finmapreduce_spark.llm.runner import MAP_OUT_SCHEMA  # noqa: F401
    from finmapreduce_spark.plans.mapreduce import map_stage

    spark = chunks.sparkSession
    with_prompt = chunks.withColumn(
        "prompt", F.format_string(cfg.map_template, F.col("question"), F.col("chunk_text"))
    ).withColumn("key", _key("map", F.col("prompt")))
    cache = _load_cache(spark, cache_dir)

    hits = with_prompt.join(F.broadcast(cache), "key").select(
        "qa_id",
        "chunk_index",
        "content",
        F.lit(None).cast("string").alias("error"),
        "input_tokens",
        "output_tokens",
    )
    miss_chunks = with_prompt.join(cache, "key", "left_anti").select(
        "qa_id", "doc_id", "question", "chunk_index", "chunk_text", "key"
    )
    fresh = map_stage(miss_chunks, cfg).persist()  # one execution: cache write + result
    # append fresh responses to the cache, re-keyed via (qa_id, chunk_index)
    keyed = fresh.join(
        miss_chunks.select("qa_id", "chunk_index", "key"), ["qa_id", "chunk_index"]
    )
    new_rows = keyed.filter(F.col("error").isNull()).select(
        "key", "content", "input_tokens", "output_tokens"
    )
    if new_rows.limit(1).count() > 0:
        new_rows.write.mode("append").parquet(cache_dir)
    out = hits.unionByName(fresh.select(*hits.columns))
    return out
