"""Cross-run response cache: second run serves every map response from
the parquet table — proven by running it with a client that refuses to
answer."""

from __future__ import annotations

import pytest

from finmapreduce_spark.llm.client import LLMResponse, RateLimitConfig, RateLimitedClient
from finmapreduce_spark.llm.response_cache import map_stage_cached
from finmapreduce_spark.plans.mapreduce import (
    MapReduceConfig,
    chunk_stage,
    join_documents,
    map_stage,
)
from finmapreduce_spark.queries.pipeline import _docs, synthetic_qa


class _Refusing:
    async def acomplete(self, prompt, *, kind="map"):
        raise ConnectionError("no paid calls allowed on the second run")


def refusing_factory():
    return RateLimitedClient(
        _Refusing(),
        RateLimitConfig(max_retries=1, base_backoff_s=0.0, requests_per_minute=10**7,
                        burst=10**6),
    )


def test_second_run_is_fully_cached(spark, sf_dir, tmp_path):
    cache_dir = str(tmp_path / "resp_cache")
    cfg = MapReduceConfig()
    qa = synthetic_qa(spark, sf_dir)
    chunks = chunk_stage(join_documents(qa, _docs(spark, sf_dir)), cfg)

    # run 1: cold cache — results must equal the plain map stage
    run1 = map_stage_cached(chunks, cfg, cache_dir)
    want = {
        (r["qa_id"], r["chunk_index"]): r["content"]
        for r in map_stage(chunks, cfg).collect()
    }
    got1 = {(r["qa_id"], r["chunk_index"]): r["content"] for r in run1.collect()}
    assert got1 == want and len(want) > 0

    # run 2: same prompts, client that refuses every call — all hits
    cfg2 = MapReduceConfig(client_factory=refusing_factory)
    run2 = map_stage_cached(chunks, cfg2, cache_dir)
    got2 = {(r["qa_id"], r["chunk_index"]): r["content"] for r in run2.collect()}
    assert got2 == want  # served entirely from the cache table


def test_partial_cache_only_pays_misses(spark, sf_dir, tmp_path):
    cache_dir = str(tmp_path / "resp_cache_partial")
    cfg = MapReduceConfig()
    qa = synthetic_qa(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    all_chunks = chunk_stage(join_documents(qa, docs), cfg)
    first_half = all_chunks.filter(all_chunks.qa_id % 2 == 0)

    map_stage_cached(first_half, cfg, cache_dir).count()  # warm half

    # full set with a refusing client: even-qa rows hit, odd-qa rows error
    cfg2 = MapReduceConfig(client_factory=refusing_factory)
    out = map_stage_cached(all_chunks, cfg2, cache_dir).collect()
    by_parity = {0: set(), 1: set()}
    for r in out:
        by_parity[r["qa_id"] % 2].add(r["error"] is None)
    assert by_parity[0] == {True}  # cached half answered
    assert by_parity[1] == {False}  # uncached half became error rows
