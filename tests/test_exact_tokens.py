"""Tokenizer-exact chunk/truncate plumbing, driven by a deterministic
fake encoder (tiktoken is absent in this image; the boundary
arithmetic is encoder-agnostic, which is exactly what these pin).
A real-tiktoken equivalence test runs when the lib exists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finmapreduce_spark.functions.exact_tokens import (
    explode_chunks_exact,
    tiktoken_available,
    truncate_words_exact,
)
from finmapreduce_spark.functions.truncation import truncate_words


class _WordEnc:
    """Whitespace 'tokenizer': encode→words, decode→join. Makes the
    exact variants comparable 1:1 with the whitespace defaults."""

    def encode(self, s):
        return s.split()

    def decode(self, toks):
        return " ".join(toks)


def _factory():
    return _WordEnc()


def test_exact_chunk_boundaries_match_closed_form(spark):
    docs = spark.createDataFrame(
        [("d1", " ".join(f"w{i}" for i in range(10))), ("d2", "only two"),
         ("d3", "")],
        "doc_name string, content string",
    )
    got = {
        (r["doc_name"], r["chunk_index"]): r["chunk_text"]
        for r in explode_chunks_exact(
            docs, chunk_size=4, chunk_overlap=1, encoder_factory=_factory
        ).collect()
    }
    # 10 tokens, size 4, step 3 -> ceil((10-4)/3)+1 = 3 chunks
    assert got[("d1", 0)] == "w0 w1 w2 w3"
    assert got[("d1", 1)] == "w3 w4 w5 w6"
    assert got[("d1", 2)] == "w6 w7 w8 w9"
    assert got[("d2", 0)] == "only two"  # n <= size: single chunk
    assert got[("d3", 0)] == ""
    assert len(got) == 5


def test_exact_truncate_equals_whitespace_twin(spark):
    # NB: empty text is the one divergence — F.split(trim('')) yields
    # [''] so the whitespace twin counts 1 token where a real
    # tokenizer counts 0; pinned separately below.
    rows = [
        (0, " ".join(f"t{i}" for i in range(30))),
        (1, "short text"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")
    for strategy in ("start", "end", "smart"):
        exact = truncate_words_exact(
            df, "body", 7, strategy=strategy, encoder_factory=_factory
        )
        twin = truncate_words(df, "body", 7, strategy=strategy)
        cols = ["id"] + [f"trunc_{c}" for c in
                         ("text", "tokens", "original", "applied", "retention")]
        assert sorted(map(tuple, exact.select(cols).collect())) == sorted(
            map(tuple, twin.select(cols).collect())
        ), strategy


def test_exact_truncate_empty_text_counts_zero(spark):
    df = spark.createDataFrame([(0, "")], "id long, body string")
    r = truncate_words_exact(
        df, "body", 7, encoder_factory=_factory
    ).first()
    assert (r["trunc_original"], r["trunc_tokens"], r["trunc_applied"]) == (
        0, 0, False,
    )
    assert r["trunc_retention"] == 1.0


def test_exact_chunk_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([("d", "x")], "doc_name string, content string")
    with pytest.raises(ValueError):
        explode_chunks_exact(docs, chunk_size=4, chunk_overlap=4,
                             encoder_factory=_factory)


def test_missing_tiktoken_fails_with_guidance():
    if tiktoken_available():
        pytest.skip("tiktoken present — gate not reachable")
    from finmapreduce_spark.functions.exact_tokens import (
        tiktoken_encoder_factory,
    )

    with pytest.raises(ImportError, match="tokenizer-exact"):
        tiktoken_encoder_factory()()


@pytest.mark.skipif(not tiktoken_available(), reason="tiktoken not installed")
def test_real_tiktoken_counts_drive_boundaries(spark):
    docs = spark.createDataFrame(
        [("d", "The quick brown fox jumps over the lazy dog. " * 50)],
        "doc_name string, content string",
    )
    import tiktoken

    enc = tiktoken.get_encoding("cl100k_base")
    n = len(enc.encode(docs.first()["content"]))
    out = explode_chunks_exact(docs, chunk_size=64, chunk_overlap=8)
    step = 56
    expect = 1 if n <= 64 else -(-(n - 64) // step) + 1
    assert out.count() == expect


def test_truncate_exact_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    for bad in (0, -5):
        with pytest.raises(ValueError, match="max_tokens"):
            truncate_words_exact(
                df, "text", bad, strategy="end", encoder_factory=_factory
            )
