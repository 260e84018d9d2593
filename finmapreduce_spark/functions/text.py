"""Text scalar functions (SURVEY §2.7).

Reference parity (file:line cites are into /root/reference):
- F1  token counting           src/utils/document_processing.py:19-23
- F8  regex score extraction   src/formatters/hybrid_formatter.py:50-55
- F11 text normalization       scripts/augment_finqa.py:24-31
- F12 number/year extraction   scripts/augment_finqa.py:34-60
- F13 weighted text similarity scripts/augment_finqa.py:63-111
- F17 md5 cache key            src/utils/document_processing.py:117-134

All are native Column expressions (codegen'd, no Python in the hot
path). The tiktoken-exact variant of F1 is a pandas_udf gated behind
import-try; the whitespace/regex approximation is the default and is
what the oracle checks (deterministic, engine-independent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish tokenization regex: runs of letters, runs of digits, or a
# single non-space symbol. Kept POSIX-simple so Spark (Java regex) and
# DuckDB (RE2) agree for oracle tests.
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def normalize_text(col: Column) -> Column:
    """F11: lowercase, strip ``,.()$%``, collapse whitespace, trim.

    Mirrors reference scripts/augment_finqa.py:24-31.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, r"[,\.\(\)\$%]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def word_tokens(col: Column) -> Column:
    """Whitespace word split (the reference's implicit tokenizer)."""
    return F.split(F.trim(col), r"\s+")


def distinct_tokens(col: Column) -> Column:
    """Distinct word set, sorted — basis for Jaccard and fingerprints."""
    return F.array_sort(F.array_distinct(word_tokens(col)))


def token_count(col: Column) -> Column:
    """F1 (approximation): whitespace token count.

    The reference counts cl100k_base tokens via tiktoken
    (document_processing.py:19-23); tiktoken is not in this image, so
    the deterministic whitespace count is the engine default. See
    :func:`tiktoken_count_udf` for the exact variant when available.
    """
    return F.size(word_tokens(col))


def approx_token_count(col: Column) -> Column:
    """F14-style estimate: BPE-ish regex token count (beats len/4)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0)))


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles as strings, for MinHash / n-gram Jaccard.

    Built with sequence+transform so it stays JVM-side; element_at is
    1-based to match DuckDB ``list_extract`` in oracle SQL.
    """
    words = word_tokens(col)
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), n - F.lit(k - 1)))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + F.lit(j)) for j in range(k)]
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Token-set Jaccard similarity of two string-array columns (F13 core).

    Generalizes reference scripts/augment_finqa.py:63-111 (its weighted
    variant combines this over years/amounts/other-token families).
    """
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def md5_key(*cols: Column) -> Column:
    """F17: md5 over '|'-joined fields — cache keys, exact-dedup keys.

    Mirrors reference document_processing.py:117-134 (md5 of
    name+method+params+mtime+size).
    """
    return F.md5(F.concat_ws("|", *cols))


def extract_score(col: Column, pattern: str = r"Score:\s*(\d+)") -> Column:
    """F8: ``Score: N`` → int; null when absent (row then fails strict >).

    Mirrors reference hybrid_formatter.py:50-55. NULL (not 0) on a
    missing score so the strict `>` filter drops malformed rows, same
    as the reference's None short-circuit.
    """
    s = F.regexp_extract(col, pattern, 1)
    return F.when(s == "", None).otherwise(s.cast("int"))


def extract_numbers(col: Column) -> Column:
    """F12: pull all integer tokens (years, amounts) from text."""
    return F.regexp_extract_all(col, F.lit(r"[0-9]+"), F.lit(0))


def mock_score_0_10(col: Column) -> Column:
    """Deterministic pseudo-relevance score 0..10 from md5 of the text.

    This is the mock-LLM scoring contract (FIXTURES.md §10): a pure
    function of the input text, reproducible in ANSI SQL as
    ``(strpos('0123456789abcdef', substr(md5(x),1,1)) - 1) % 11``.
    """
    first_hex = F.substring(F.md5(col), 1, 1)
    return ((F.instr(F.lit("0123456789abcdef"), first_hex) - 1) % 11).cast("int")


def tiktoken_count_udf():
    """Exact cl100k_base token count as a pandas_udf, if tiktoken exists.

    Returns None when tiktoken is unavailable (this image); callers
    fall back to :func:`token_count`.
    """
    try:
        import tiktoken  # noqa: F401
    except ImportError:
        return None

    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _count(texts: pd.Series) -> pd.Series:
        enc = tiktoken.get_encoding("cl100k_base")
        return texts.fillna("").map(lambda s: len(enc.encode(s)))

    return _count
