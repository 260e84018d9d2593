"""F3–F6 — token-budget truncation.

Reference: binary search over whitespace-split words for the longest
prefix/suffix within a token budget, returning stats
(/root/reference/src/utils/truncation_utils.py:35-156), plus the
budget calculation ``context_window - question_tokens - buffer``
floored at 1000 (truncation_formatter.py:45-73).

With the whitespace token model the binary search collapses to a
closed-form slice — O(1) per row, pure JVM expressions, no UDF. The
tokenizer-exact variant would reintroduce the per-row binary search
inside a pandas_udf; the contract (truncated text + stats struct) is
identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finmapreduce_spark.functions.text import word_tokens

MIN_BUDGET = 1000  # reference truncation_utils.py:230-266 floor


def truncation_budget(
    context_window: Column | int, question_tokens: Column, buffer: int = 500
) -> Column:
    """F6: max_doc_tokens = max(1000, context_window - question - buffer)."""
    cw = F.lit(context_window) if isinstance(context_window, int) else context_window
    return F.greatest(F.lit(MIN_BUDGET), cw - question_tokens - F.lit(buffer))


def truncate_words(
    df: DataFrame,
    text_col: str,
    max_tokens: int | Column,
    strategy: str = "start",
    out_prefix: str = "trunc",
) -> DataFrame:
    """F3 (start) / F4 (end) / F5 (smart→start): budgeted word slice.

    ``max_tokens`` may be a per-ROW Column — the F6 budget
    (``truncation_budget``) depends on each question's token count, so
    the reference computes a distinct budget per QA
    (truncation_utils.py:230-266), not one scalar per job.

    Adds columns:
      {p}_text       — truncated text
      {p}_tokens     — kept token count
      {p}_original   — original token count
      {p}_applied    — whether truncation happened
      {p}_retention  — kept/original rate (reference's retention_rate,
                       guarded division as mapreduce_pipeline.py:398)
    """
    if strategy not in ("start", "end", "smart"):
        raise ValueError(f"unknown strategy {strategy!r}")
    effective = "start" if strategy == "smart" else strategy

    budget = F.lit(max_tokens) if isinstance(max_tokens, int) else max_tokens
    words = word_tokens(F.col(text_col))
    n = F.size(words)
    kept_n = F.least(n, budget)
    if effective == "start":
        kept = F.slice(words, F.lit(1), budget)
    else:  # longest suffix
        start = F.greatest(F.lit(1), n - budget + F.lit(1))
        kept = F.slice(words, start, budget)
    p = out_prefix
    # NULL text stays NULL in EVERY output column, not just the text:
    # concat_ws(NULL array) coerces to '' and least(NULL, budget)
    # skips the NULL (both engines), so an unguarded row would claim
    # it "kept `budget` tokens at retention 1.0" — a failed-parse doc
    # must stay visibly unparsed. Guards are on the text column
    # itself (size(NULL) is -1 under ANSI-off, so n-based guards are
    # mode-dependent).
    present = F.col(text_col).isNotNull()
    return (
        df.withColumn(
            f"{p}_text", F.when(present, F.concat_ws(" ", kept))
        )
        .withColumn(f"{p}_tokens", F.when(present, kept_n).cast("long"))
        .withColumn(f"{p}_original", F.when(present, n).cast("long"))
        .withColumn(f"{p}_applied", F.when(present, n > budget))
        .withColumn(
            f"{p}_retention",
            F.when(
                present, F.when(n > 0, kept_n / n).otherwise(F.lit(1.0))
            ),
        )
    )
