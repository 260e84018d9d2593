"""Golden-path + edge-case tests for the MapReduce DAG (FIXTURES.md §3
requirements: shared doc, missing doc, empty doc, multi-chunk docs,
judge batching 2 full + 1 partial batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finmapreduce_spark.plans.mapreduce import (
    MapReduceConfig,
    run_mapreduce,
)

CFG = MapReduceConfig(chunk_size=120, chunk_overlap=20)


@pytest.fixture(scope="module")
def fixture_tables(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma " * 30),  # many chunks, shared by 2 QAs
            (1, "short doc"),  # single chunk
            (2, ""),  # empty content → P5 error row
            (3, "delta " * 60),  # multi-chunk
        ],
        "doc_id long, text string",
    )
    qa = spark.createDataFrame(
        [(i, d, f"question {i}?", "gold") for i, d in enumerate(
            [0, 0, 1, 2, 3, 999, 3, 1, 0, 3, 1]  # 11 rows → batches 5+5+1
        )],
        "qa_id long, doc_id long, question string, answer string",
    )
    return run_mapreduce(qa, docs, CFG)


def test_error_rows_preserved(spark, fixture_tables):
    stages = fixture_tables
    answers = {r["qa_id"]: r.asDict() for r in stages["answers"].collect()}
    assert len(answers) == 11  # every QA present, none dropped
    assert answers[5]["doc_error"] == "document not found"  # doc 999
    assert answers[3]["doc_error"] == "empty document"  # doc 2
    assert answers[5]["llm_answer"] is None
    ok = [a for a in answers.values() if a["doc_error"] is None]
    assert len(ok) == 9


def test_shared_doc_chunks_once_per_qa(spark, fixture_tables):
    stages = fixture_tables
    chunks = stages["chunks"].groupBy("qa_id").count().collect()
    by_qa = {r["qa_id"]: r["count"] for r in chunks}
    # QAs 0, 1, 8 share doc 0 → identical chunk counts
    assert by_qa[0] == by_qa[1] == by_qa[8] > 1


def test_judge_covers_all_batches(spark, fixture_tables):
    """11 QAs → batches of 5: 5+5+1; every QA gets exactly one verdict
    (the J3 key join back cannot drop or duplicate)."""
    stages = fixture_tables
    verdicts = stages["judgments"].collect()
    assert len(verdicts) == 11
    assert {r["qa_id"] for r in verdicts} == set(range(11))
    domain = {"Correct", "Incorrect", "No answer", "Error"}
    assert {r["judgment"] for r in verdicts} <= domain
    # error-path QAs (missing/empty doc) must be judged 'No answer'
    by_qa = {r["qa_id"]: r["judgment"] for r in verdicts}
    assert by_qa[5] == "No answer"
    assert by_qa[3] == "No answer"


def test_strict_threshold(spark, fixture_tables):
    """Score exactly == threshold is dropped (reference strict `>`)."""
    stages = fixture_tables
    kept = stages["kept"].select("score").distinct().collect()
    assert all(r["score"] > CFG.score_threshold for r in kept)


def test_persist_llm_outputs_flag(spark, sf_dir):
    """With persist_llm_outputs, the paid stages carry a storage level
    (multiple consumers / lineage recompute won't re-fire LLM calls);
    results are unchanged."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.plans.mapreduce import MapReduceConfig, run_mapreduce
    from finmapreduce_spark.queries.pipeline import synthetic_qa, _docs

    qa = synthetic_qa(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    base_cfg = MapReduceConfig()
    pers_cfg = MapReduceConfig(persist_llm_outputs=True)
    plain = run_mapreduce(qa, docs, base_cfg)
    persisted = run_mapreduce(qa, docs, pers_cfg)
    # (the plain run's storage level is NOT asserted: Spark's cache
    # manager matches by logical plan, so the identical plain plan
    # reports the persisted run's level)
    assert persisted["mapped"].storageLevel.useMemory
    assert persisted["reduced"].storageLevel.useMemory
    a = sorted(map(tuple, plain["answers"].select("qa_id", "llm_answer").collect()))
    b = sorted(map(tuple, persisted["answers"].select("qa_id", "llm_answer").collect()))
    assert a == b
    persisted["mapped"].unpersist()
    persisted["reduced"].unpersist()


def test_max_reduce_chunks_guard(spark, sf_dir):
    """Per-group size guard: with max_reduce_chunks=2, no QA gathers
    more than 2 chunks, the survivors are the top-scored ones, and
    unguarded QAs with <=2 kept chunks are unchanged."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.plans.mapreduce import MapReduceConfig, run_mapreduce
    from finmapreduce_spark.queries.pipeline import synthetic_qa, _docs

    qa = synthetic_qa(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    # small chunks so fixture-scale documents keep >2 chunks per QA
    free = run_mapreduce(qa, docs, MapReduceConfig(chunk_size=96, chunk_overlap=8))
    guarded = run_mapreduce(
        qa,
        docs,
        MapReduceConfig(chunk_size=96, chunk_overlap=8, max_reduce_chunks=2),
    )
    free_kept = {r["qa_id"]: r["n_kept"] for r in free["reduced"].collect()}
    g_kept = {r["qa_id"]: r["n_kept"] for r in guarded["reduced"].collect()}
    assert set(g_kept) == set(free_kept)  # same QAs reach reduce
    assert max(g_kept.values()) <= 2
    assert any(v > 2 for v in free_kept.values())  # the guard actually bit
    for k, v in g_kept.items():
        assert v == min(2, free_kept[k])


def test_bucketed_judge_batching_verdicts_invariant(spark, fixture_tables):
    """The scale-path judge batching (hash buckets, no global sort —
    now the DEFAULT) must produce the SAME per-QA verdicts as the
    reference-exact global batching, with every batch ≤ k."""
    from dataclasses import replace

    from finmapreduce_spark.plans.mapreduce import judge_stage

    stages = fixture_tables
    answers = stages["answers"]
    cfg_g = replace(CFG, judge_batching="global")
    global_v = {
        (r["qa_id"], r["judgment"])
        for r in judge_stage(answers, cfg_g).collect()
    }
    cfg_b = replace(CFG, judge_batching="bucketed", judge_buckets=4)
    bucketed = judge_stage(answers, cfg_b)
    got = {(r["qa_id"], r["judgment"]) for r in bucketed.collect()}
    assert got == global_v


def test_default_judge_batching_has_no_unpartitioned_window(spark, fixture_tables):
    """Plan pin for the flipped default: the serving/CLI path
    (MapReduceConfig() as-is) must contain NO unpartitioned window —
    the global-sort batching is opt-in for the parity oracles only."""
    from finmapreduce_spark.plans.mapreduce import MapReduceConfig, judge_stage

    assert MapReduceConfig().judge_batching == "bucketed"
    plan = judge_stage(
        fixture_tables["answers"], MapReduceConfig()
    )._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            # every window spec must carry at least one partition expr:
            # unpartitioned specs render windowspecdefinition(ORDER...)
            inner = line.lower().split("windowspecdefinition(", 1)[1]
            assert not inner.lstrip().startswith("qa_id"), line
            assert "__bucket" in inner or "pmod" in inner, line


def test_json_format_struct_filter(spark):
    """P2 json format: the map reply parses into MAP_RESULT_SCHEMA and
    filters on the struct field; unparseable replies score 0 and drop
    (reference json_formatter.py:17-34)."""
    cfg = MapReduceConfig(chunk_size=120, chunk_overlap=20, format_type="json")
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma " * 30), (1, "short doc"), (3, "delta " * 60)],
        "doc_id long, text string",
    )
    qa = spark.createDataFrame(
        [(i, d, f"question {i}?", "gold") for i, d in enumerate([0, 1, 3])],
        "qa_id long, doc_id long, question string, answer string",
    )
    stages = run_mapreduce(qa, docs, cfg)
    mapped = stages["mapped"].collect()
    assert mapped, "map stage empty"
    import json as _json

    parsed, malformed = 0, 0
    for r in mapped:
        try:
            obj = _json.loads(r["content"])
            parsed += 1
            assert set(obj) == {
                "summary", "terms", "evidence", "answer", "relevance_score"
            }
        except ValueError:
            malformed += 1
            assert r["content"] == "model returned no score"
    assert parsed > 0
    kept = stages["kept"].collect()
    assert all(r["score"] > cfg.score_threshold for r in kept)
    # struct fields survive the filter for downstream XML rendering
    assert all(r["map_result"]["relevance_score"] == r["score"] for r in kept)
    # strictness + malformed-drop: no kept row lacks a parsed struct
    assert all(r["map_result"] is not None for r in kept)
    # e2e: answers still produced under the json format
    answers = stages["answers"].collect()
    assert {r["qa_id"] for r in answers} == {0, 1, 2}


def test_judge_malformed_reply_never_misattributes(spark):
    """Round-10 property sweep (VERDICT r9 next #5): the judge reply's
    per-item assignment is keyed by evaluation_number and joined back
    by qa_id — REORDERED, TRUNCATED, DUPLICATED, and OUT-OF-RANGE
    evaluation_numbers must never land a verdict on the wrong QA. The
    reference's positional apply-back (async_evaluation.py:406-418)
    would misassign under the reversed+truncated reply this fake
    emits; the key-join provably cannot. Identity is threaded through
    the reply itself: each result's reasoning embeds the <gold> text
    of the item it claims to judge, and gold encodes the qa_id."""
    import re
    from dataclasses import replace as _replace

    from finmapreduce_spark.llm.client import (
        LLMResponse,
        RateLimitConfig,
        RateLimitedClient,
    )
    from finmapreduce_spark.plans.mapreduce import judge_stage

    class AdversarialJudge:
        async def acomplete(self, prompt, *, kind="judge"):
            import json

            golds = re.findall(r"<gold>gold-(\d+)</gold>", prompt)
            results = [
                {
                    "evaluation_number": i,
                    "judgement": "Correct",
                    "reasoning": f"seen:gold-{qid}",
                }
                for i, qid in enumerate(golds, start=1)
            ]
            if len(golds) >= 4:
                # full batch: reverse order, drop number 3, overwrite
                # number 1 with a later duplicate, add junk numbers
                results = [r for r in results if r["evaluation_number"] != 3]
                results.reverse()
                results.append(
                    {"evaluation_number": 1, "judgement": "Incorrect",
                     "reasoning": "dup-overwrite"}
                )
                results.append({"evaluation_number": 0, "judgement": "X",
                                "reasoning": "junk"})
                results.append({"evaluation_number": 99, "judgement": "X",
                                "reasoning": "junk"})
                return LLMResponse(
                    json.dumps({"evaluation_results": results})
                )
            # partial batch: outright non-JSON prose
            return LLMResponse("I refuse to emit JSON today.")

    def factory():
        return RateLimitedClient(
            AdversarialJudge(),
            RateLimitConfig(
                requests_per_minute=60_000_000,
                tokens_per_minute=60_000_000_000,
                burst=10_000_000,
            ),
        )

    # 7 QAs, global batching, batch of 5 -> one full batch (qa 10..14
    # sorted) + one partial (qa 15, 16). Non-consecutive ids prove the
    # join key is qa_id, not position.
    qa_ids = [14, 10, 12, 16, 11, 15, 13]
    answers = spark.createDataFrame(
        [(q, f"answer {q}", f"gold-{q}") for q in qa_ids],
        "qa_id long, llm_answer string, answer string",
    )
    cfg = _replace(
        CFG, client_factory=factory, judge_batching="global",
        judge_batch_size=5,
    )
    got = {
        r["qa_id"]: (r["judgment"], r["reasoning"])
        for r in judge_stage(answers, cfg).collect()
    }
    assert set(got) == set(qa_ids)  # no drops, no dupes
    full = sorted(qa_ids)[:5]  # 10..14 -> evaluation_numbers 1..5
    for pos, q in enumerate(full, start=1):
        if pos == 1:
            # duplicated number: LAST entry wins, deterministically
            assert got[q] == ("Incorrect", "dup-overwrite")
        elif pos == 3:
            # truncated out of the reply -> typed per-item fallback
            assert got[q] == ("Error", "missing item")
        else:
            # reversed order + junk numbers: still the RIGHT item
            assert got[q] == ("Correct", f"seen:gold-{q}")
    for q in sorted(qa_ids)[5:]:  # non-JSON batch -> all Error
        assert got[q][0] == "Error"
