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


def run_llm_stage_cached(
    df: DataFrame,
    *,
    prompt_col: str,
    kind: str,
    out_schema: str,
    row_builder,
    client_factory,
    cache_dir: str,
    expect_json: bool = False,
    concurrency: int = 50,
) -> DataFrame:
    """Generic cache wrapper for ANY LLM stage (map/reduce/judge).

    Three steps, all distributed:
      1. split: prompts anti-join the cache table (hits carry the
         cached content; only misses will pay),
      2. misses run the real stage in RAW mode — the mapInPandas echo
         builder passes the input row through plus the raw response
         (content/tokens/error) so fresh responses can append to the
         cache even for builders whose output discards raw content
         (reduce parses it away; judge explodes one response into many
         rows). Raws are written ONCE to a staging parquet under
         ``cache_dir/_staging`` (underscore prefix: invisible to the
         cache table read); every downstream consumer reads that file,
         so the paid stage executes exactly once regardless of plan
         re-execution, AQE re-planning, or executor loss — durability
         a ``.persist()`` cannot promise (and in practice plan-cache
         interactions around the mid-build append made a persisted
         miss-leg silently recompute empty; the staging file is
         immune by construction),
      3. replay: hits ∪ staged raws run the stage's ``row_builder`` in
         a second mapInPandas with NO client — pure parsing, zero LLM
         calls. Every row is built by the same builder whether it hit
         or missed, so cached and uncached runs are value-identical.

    The cache join is left to Catalyst (AQE broadcasts a small cache,
    shuffles a 100-TB one); no driver collection anywhere.
    """
    import uuid

    import pandas as pd

    from pyspark.sql import types as T

    from finmapreduce_spark.llm.client import LLMResponse
    from finmapreduce_spark.llm.runner import run_llm_stage

    spark = df.sparkSession
    keyed = df.withColumn("__key", _key(kind, F.col(prompt_col)))
    cache = _load_cache(spark, cache_dir)

    in_cols = [f.name for f in keyed.schema.fields]
    raw_fields = [
        T.StructField("__content", T.StringType(), True),
        T.StructField("__error", T.StringType(), True),
        T.StructField("__in_tok", T.LongType(), True),
        T.StructField("__out_tok", T.LongType(), True),
    ]
    raw_schema = T.StructType(list(keyed.schema.fields) + raw_fields)

    hits = keyed.join(
        cache.select(
            F.col("key").alias("__key"),
            F.col("content").alias("__content"),
            F.col("input_tokens").alias("__in_tok"),
            F.col("output_tokens").alias("__out_tok"),
        ),
        "__key",
    ).select(*in_cols, "__content", F.lit(None).cast("string").alias("__error"),
             "__in_tok", "__out_tok")
    misses = keyed.join(cache.select(F.col("key").alias("__key")), "__key", "left_anti")

    def echo_builder(pdf: pd.DataFrame, responses: list) -> pd.DataFrame:
        out = pdf[in_cols].copy()
        out["__content"] = [
            None if isinstance(r, Exception) else r.content for r in responses
        ]
        out["__error"] = [
            str(r) if isinstance(r, Exception) else None for r in responses
        ]
        out["__in_tok"] = [
            0 if isinstance(r, Exception) else r.input_tokens for r in responses
        ]
        out["__out_tok"] = [
            0 if isinstance(r, Exception) else r.output_tokens for r in responses
        ]
        return out

    # The ONLY execution of the paid stage: write raws durably, then
    # read them back for both the cache append and the replay.
    staging = os.path.join(cache_dir, "_staging", f"{kind}-{uuid.uuid4().hex}")
    run_llm_stage(
        misses,
        prompt_col=prompt_col,
        kind=kind,
        out_schema=raw_schema,
        row_builder=echo_builder,
        client_factory=client_factory,
        expect_json=expect_json,
        concurrency=concurrency,
    ).write.mode("overwrite").parquet(staging)
    # explicit schema: an all-hits run stages an empty dataset, which
    # schema inference would reject
    fresh_raw = spark.read.schema(raw_schema).parquet(staging)

    new_rows = fresh_raw.filter(F.col("__error").isNull()).select(
        F.col("__key").alias("key"),
        F.col("__content").alias("content"),
        F.col("__in_tok").alias("input_tokens"),
        F.col("__out_tok").alias("output_tokens"),
    )
    if new_rows.limit(1).count() > 0:
        new_rows.write.mode("append").parquet(cache_dir)

    combined = hits.unionByName(fresh_raw)

    def replay(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            responses = [
                RuntimeError(e)
                if e is not None
                else LLMResponse(
                    content=c,
                    input_tokens=int(i),
                    output_tokens=int(o),
                    cache_read_tokens=0,
                )
                for c, e, i, o in zip(
                    pdf["__content"], pdf["__error"], pdf["__in_tok"], pdf["__out_tok"]
                )
            ]
            yield row_builder(
                pdf.drop(columns=["__content", "__error", "__in_tok", "__out_tok"]),
                responses,
            )

    return combined.mapInPandas(replay, schema=out_schema)


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


def compact_response_cache(spark: SparkSession, cache_dir: str) -> dict:
    """Offline compaction for the append-only cache table.

    Every cached stage run appends a few files and leaves a raw
    staging dir behind; months of runs accrete thousands of small
    files whose LISTING (not size) becomes the cache-read cost.
    Compaction rewrites the table as one deduped, key-sorted parquet
    (sorting aids dictionary/RLE compression on the md5 keys), then
    atomically swaps it in and drops consumed staging dirs. Staged
    SUCCESS rows are already folded into the table by the appends;
    staged ERROR rows are deliberately not retained (errors must
    retry fresh). Local-FS rename is atomic; an object-store
    deployment swaps via a versioned prefix + pointer instead.

    Returns {"rows", "files_before", "files_after"}.
    """
    import shutil

    files_before = (
        sum(1 for f in os.listdir(cache_dir) if f.endswith(".parquet"))
        if os.path.isdir(cache_dir)
        else 0
    )
    cache = _load_cache(spark, cache_dir)
    tmp = cache_dir.rstrip("/") + ".compact-tmp"
    cache.sortWithinPartitions("key").write.mode("overwrite").parquet(tmp)
    rows = spark.read.parquet(tmp).count()
    old = cache_dir.rstrip("/") + ".compact-old"
    if os.path.isdir(cache_dir):
        os.rename(cache_dir, old)
    os.rename(tmp, cache_dir)
    shutil.rmtree(old, ignore_errors=True)
    files_after = sum(
        1 for f in os.listdir(cache_dir) if f.endswith(".parquet")
    )
    return {
        "rows": rows,
        "files_before": files_before,
        "files_after": files_after,
    }
