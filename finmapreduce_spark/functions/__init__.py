"""Scalar/text function library (SURVEY §2.7 F1–F18).

Everything here is a *Column expression builder* — pure JVM-side
`pyspark.sql.functions` compositions that stay inside whole-stage
codegen. Python/Pandas UDFs appear only where an external library is
genuinely required (tiktoken-exact token counts, F1) and are gated
behind import-try with a deterministic whitespace fallback.
"""

from finmapreduce_spark.functions.text import (
    normalize_text,
    word_tokens,
    distinct_tokens,
    token_count,
    approx_token_count,
    word_shingles,
    jaccard,
    md5_key,
    extract_score,
    extract_numbers,
)
from finmapreduce_spark.functions.chunking import (
    chunk_plan,
    explode_chunks,
)
from finmapreduce_spark.functions.truncation import truncate_words

__all__ = [
    "normalize_text",
    "word_tokens",
    "distinct_tokens",
    "token_count",
    "approx_token_count",
    "word_shingles",
    "jaccard",
    "md5_key",
    "extract_score",
    "extract_numbers",
    "chunk_plan",
    "explode_chunks",
    "truncate_words",
]
