"""The truncation QA DAG (reference src/core/truncation_pipeline.py:51-107):
load full document → token-budget truncate (F3/F6) → single LLM call
(U3) → parse → truncation stats (A7).

Spark plan: qa ⟕ broadcast(docs) → closed-form word-budget truncation
(pure expressions, functions/truncation.py) → one mapInPandas LLM
stage → stats aggregation. No shuffle before the LLM stage at all —
the whole prepare path is narrow.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finmapreduce_spark.functions.truncation import truncate_words
from finmapreduce_spark.llm.client import robust_json_parse
from finmapreduce_spark.llm.runner import mock_client_factory, run_llm_stage
from finmapreduce_spark.plans.mapreduce import join_documents


@dataclass
class TruncationConfig:
    max_doc_tokens: int = 100  # F6 output; fixture-scale budget
    strategy: str = "start"  # start|end|smart (F3/F4/F5)
    # Token model for the budget (round 15): None resolves
    # FMR_TOKEN_MODEL → "bpe" (DEFAULT — budgets count vendored-BPE
    # tokens, matching the reference's tiktoken-token budgets,
    # truncation_utils.py:35-120); "tiktoken" when installed;
    # "words" keeps the closed-form whitespace model the word-based
    # parity oracles pin explicitly.
    token_model: str | None = None
    client_factory: object = mock_client_factory
    # F6 per-QA budget mode (reference truncation_utils.py:230-266 +
    # main_async --context_window/--buffer): when context_window is
    # set, each row's budget is max(1000, context_window −
    # question_tokens − buffer) — a different document budget per
    # question — and max_doc_tokens is ignored.
    context_window: int | None = None
    buffer: int = 2000
    # cross-run response cache — paid-call idempotency parity with
    # the mapreduce DAG (same table layout/namespace semantics; a
    # re-run of a truncation job re-pays nothing)
    response_cache_dir: str | None = None
    response_cache_namespace: str = ""


def truncate_docs(qa_docs: DataFrame, cfg: TruncationConfig) -> DataFrame:
    from finmapreduce_spark.functions.token_model import token_model

    ok = qa_docs.filter(F.col("doc_error").isNull())
    model = (
        cfg.token_model
        if cfg.token_model == "words"
        else token_model(cfg.token_model)
    )
    if cfg.context_window is not None:
        from finmapreduce_spark.functions.text import word_tokens
        from finmapreduce_spark.functions.truncation import truncation_budget

        # Per-QA Column budgets stay on the closed-form word path:
        # truncate_words_exact takes a scalar budget (one UDF per
        # budget value), so the F6 per-row-budget mode keeps word
        # semantics regardless of model — documented limit, the
        # reference's own budget floor logic is model-independent.
        budget = truncation_budget(
            cfg.context_window,
            F.size(word_tokens(F.col("question"))),
            buffer=cfg.buffer,
        )
        return truncate_words(
            ok, "text", budget, strategy=cfg.strategy, out_prefix="trunc"
        )
    if model == "words":
        return truncate_words(
            ok,
            "text",
            cfg.max_doc_tokens,
            strategy=cfg.strategy,
            out_prefix="trunc",
        )
    from finmapreduce_spark.functions.exact_tokens import truncate_words_exact
    from finmapreduce_spark.functions.token_model import (
        default_encoder_factory,
    )

    return truncate_words_exact(
        ok,
        "text",
        cfg.max_doc_tokens,
        strategy=cfg.strategy,
        out_prefix="trunc",
        encoder_factory=default_encoder_factory(model),
    )


def answer_row_builder(pdf: pd.DataFrame, responses: list) -> pd.DataFrame:
    answers, reasonings, errors = [], [], []
    for r in responses:
        if isinstance(r, Exception):
            answers.append(None)
            reasonings.append(None)
            errors.append(str(r))
            continue
        try:
            parsed = robust_json_parse(r.content)
        except ValueError:
            # reference truncation_formatter.py:163-171 — a reply
            # that is not JSON IS the answer (plain prose from a
            # provider that ignored or never received the JSON
            # instruction), never a silent None on a paid call
            parsed = {"answer": r.content}
        answers.append(parsed.get("answer"))
        reasonings.append(parsed.get("reasoning"))
        errors.append(None)
    return pd.DataFrame(
        {
            "qa_id": pdf["qa_id"].values,
            "trunc_applied": pdf["trunc_applied"].values,
            "trunc_retention": pdf["trunc_retention"].values,
            "llm_answer": answers,
            "llm_reasoning": reasonings,
            "error": errors,
        }
    )


ANSWER_SCHEMA = (
    "qa_id long, trunc_applied boolean, trunc_retention double, "
    "llm_answer string, llm_reasoning string, error string"
)


def run_truncation(
    qa: DataFrame, docs: DataFrame, cfg: TruncationConfig | None = None
) -> dict[str, DataFrame]:
    cfg = cfg or TruncationConfig()
    # S7: full-document load = the same J1 join, un-chunked
    qa_docs = join_documents(qa, docs)
    truncated = truncate_docs(qa_docs, cfg)
    with_prompt = truncated.withColumn(
        "prompt",
        F.concat(F.col("question"), F.lit("\n\n"), F.col("trunc_text")),
    )
    stage_kw = dict(
        prompt_col="prompt",
        kind="truncation",
        out_schema=ANSWER_SCHEMA,
        row_builder=answer_row_builder,
        client_factory=cfg.client_factory,
        # reference main_async.py:175-182 creates the truncation LLM
        # with parse_json=False and the formatter text-falls-back
        # (truncation_formatter.py:163-171) — demanding JSON at the
        # retry layer would burn the retry budget on live prose
        # replies to a prompt that never asks for JSON.
        expect_json=False,
    )
    if cfg.response_cache_dir:
        from finmapreduce_spark.llm.response_cache import run_llm_stage_cached

        answered = run_llm_stage_cached(
            with_prompt,
            cache_dir=cfg.response_cache_dir,
            namespace=cfg.response_cache_namespace,
            **stage_kw,
        )
    else:
        answered = run_llm_stage(with_prompt, **stage_kw)
    return {"qa_docs": qa_docs, "truncated": truncated, "answered": answered}
