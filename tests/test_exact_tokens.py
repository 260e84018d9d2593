"""Tokenizer-exact chunk/truncate plumbing, value-tested three ways:
a whitespace fake pins the boundary arithmetic 1:1 against the
whitespace twin; the vendored 200-merge BPE model
(tests/fixtures/mini_bpe_merges.txt + functions/mini_bpe.py) pins
REAL subword-token boundaries against hand-verified goldens — the
code path the reference drives with tiktoken cl100k
(document_processing.py:19-23,246-267) — and a real-tiktoken
equivalence test runs when the lib exists."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from finmapreduce_spark.functions.exact_tokens import (
    explode_chunks_exact,
    tiktoken_available,
    truncate_words_exact,
)
from finmapreduce_spark.functions.mini_bpe import MergesBPE
from finmapreduce_spark.functions.truncation import truncate_words

MERGES_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "mini_bpe_merges.txt"
)


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


# ---------------------------------------------------------------------------
# Vendored mini-BPE model: REAL subword boundaries, hand-verified
# goldens (VERDICT r8 #1 — the tokenizer-exact lane's value test no
# longer depends on the whitespace fake).
# ---------------------------------------------------------------------------


def test_mini_bpe_hand_derived_merges():
    """Fully hand-derivable case: rank-greedy BPE on a 4-merge list.
    hello = h e l l o → (h,e)@0 → (l,l)@1 → (he,ll)@2 → (hell,o)@3."""
    enc = MergesBPE([("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")])
    ids = enc.encode("hello hello")
    assert [enc._tok[i] for i in ids] == ["hello", " ", "hello"]
    assert enc.decode(ids) == "hello hello"
    # merges apply only inside lowercase runs; other chars are 1 token
    ids2 = enc.encode("Hello, hell!")
    assert [enc._tok[i] for i in ids2] == [
        "H", "e", "ll", "o", ",", " ", "hell", "!",
    ]
    assert enc.decode(ids2) == "Hello, hell!"


def test_mini_bpe_vendored_fixture_tokenization():
    """Golden token sequence under the committed 200-merge model.
    Frequent corpus words merged to single tokens; 'The' keeps the
    uppercase T separate; 'strong' stays subword (st|r|on|g)."""
    enc = MergesBPE.from_merges_file(MERGES_FIXTURE)
    text = "The company reported strong revenue growth this quarter."
    ids = enc.encode(text)
    assert [enc._tok[i] for i in ids] == [
        "T", "h", "e", " ", "company", " ", "report", "ed", " ",
        "st", "r", "on", "g", " ", "revenue", " ", "growth", " ",
        "th", "i", "s", " ", "quarter", ".",
    ]
    assert enc.decode(ids) == text
    # round-trip losslessness over awkward inputs
    for s in ("", "UPPER lower 123 !?", "  spaced\n\nlines\t", "mixedCase"):
        assert enc.decode(enc.encode(s)) == s


def test_exact_chunk_golden_boundaries_mini_bpe(spark):
    """explode_chunks_exact against the vendored model: 24 tokens,
    size 8, overlap 2 → step 6 → ceil((24-8)/6)+1 = 4 chunks whose
    strings were verified by hand from the token sequence above
    (chunk i = decode(tokens[6i : 6i+8])) — note the mid-word splits
    ('thi', 'g revenue') only a real subword tokenizer produces."""
    text = "The company reported strong revenue growth this quarter."
    docs = spark.createDataFrame(
        [("d1", text)], "doc_name string, content string"
    )
    merges = list(MergesBPE.from_merges_file(MERGES_FIXTURE).ranks)
    out = explode_chunks_exact(
        docs, chunk_size=8, chunk_overlap=2,
        encoder_factory=MergesBPE.factory(merges),
    ).orderBy("chunk_index")
    assert [r["chunk_text"] for r in out.collect()] == [
        "The company reported",
        "reported strong ",
        "g revenue growth thi",
        "this quarter.",
    ]


def test_exact_truncate_golden_boundaries_mini_bpe(spark):
    """truncate_words_exact against the vendored model — start keeps
    tokens[:10] ('...reported st' cuts INSIDE 'strong'), end keeps
    tokens[-10:], an over-budget doc passes through untouched."""
    text = "The company reported strong revenue growth this quarter."
    df = spark.createDataFrame([(1, text)], "id long, body string")
    merges = list(MergesBPE.from_merges_file(MERGES_FIXTURE).ranks)
    factory = MergesBPE.factory(merges)

    r = truncate_words_exact(
        df, "body", 10, strategy="start", encoder_factory=factory
    ).first()
    assert r["trunc_text"] == "The company reported st"
    assert (r["trunc_tokens"], r["trunc_original"], r["trunc_applied"]) == (
        10, 24, True,
    )
    assert r["trunc_retention"] == pytest.approx(10 / 24)

    r = truncate_words_exact(
        df, "body", 10, strategy="end", encoder_factory=factory
    ).first()
    assert r["trunc_text"] == "revenue growth this quarter."

    r = truncate_words_exact(
        df, "body", 100, strategy="start", encoder_factory=factory
    ).first()
    assert (r["trunc_text"], r["trunc_applied"]) == (text, False)


def test_mini_bpe_fixture_is_deterministic():
    """The committed fixture regenerates byte-identically (the
    trainer is sequential BPE with the engine trainer's exact
    tie-break: max count, then lexicographically smallest pair)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_mini_bpe_fixture",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "make_mini_bpe_fixture.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    regenerated = mod.train(mod.CORPUS, mod.N_MERGES)
    committed = list(MergesBPE.from_merges_file(MERGES_FIXTURE).ranks)
    assert regenerated == committed
    assert len(committed) == 200


def test_jvm_bpe_tokens_match_mergesbpe_on_real_corpus(spark, sf_dir):
    """The catalog's JVM tokenizer (queries/training.py::
    _bpe_tokens_col — sentinel-delimited bounded-pass replaces) must
    produce EXACTLY MergesBPE.encode's tokens on real corpus text,
    and tokens must reassemble the text losslessly. This pins the
    driver-witnessed bpe_chunk_documents_exact query to the
    production Python encoder the tokenizer-exact lane uses."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.training import _bpe_tokens_col
    from finmapreduce_spark.session import read_table

    merges = [("e", "r"), ("o", "r"), ("i", "n")]
    docs = read_table(spark, sf_dir, "documents").limit(50)
    got = docs.select(
        "text", _bpe_tokens_col(F.col("text"), merges).alias("tk")
    ).collect()
    enc = MergesBPE(merges)
    for r in got:
        text = (r["text"] or "").replace("\x1e", "")
        py = [enc._tok[i] for i in enc.encode(text)]
        assert list(r["tk"]) == (py or [""])
        assert "".join(r["tk"]) == text


@pytest.mark.parametrize(
    "text,merges",
    [
        # round-9 review #1: '.' in the char-split regex must match
        # line terminators ((?s)) or punct+newline runs stay fused
        ("ends.\nNext line", [("e", "r"), ("o", "r"), ("i", "n")]),
        ("error training\n\nrain", [("e", "r"), ("i", "n")]),
        ("AB\r\ncd", [("c", "d")]),
        # round-9 review #4: left==right merges on repeated-char runs
        # — the doubled-separator single-pass replace must equal
        # greedy ('a'*10 → 5×aa, never the alternating 6-token form)
        ("a" * 10 + " " + "a" * 5, [("a", "a")]),
        ("ll bell llll", [("l", "l"), ("ll", "ll")]),
        ("", [("e", "r")]),
        # astral-plane parity: Java regex '.' under (?s) matches a
        # full code point (surrogate PAIR), DuckDB string_split('')
        # and Python iteration split code points — probed identical
        # across all three engines (round-9)
        ("smile \U0001F600 end", [("e", "r")]),
        ("mixed é\U0001F4A9 er", [("e", "r")]),
        ("\U0001F600\U0001F600", [("e", "r")]),
    ],
)
def test_jvm_bpe_tokens_pathological_parity(spark, text, merges):
    """JVM tokenizer ≡ MergesBPE on the inputs the round-9 review
    proved divergent under the previous implementation."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.training import _bpe_tokens_col

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(_bpe_tokens_col(F.col("text"), merges).alias("tk")).first()
    enc = MergesBPE(merges)
    py = [enc._tok[i] for i in enc.encode(text)]
    assert list(got["tk"]) == (py or [""])
    assert "".join(got["tk"]) == text


def test_truncate_exact_rejects_nonpositive_budget(spark):
    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    for bad in (0, -5):
        with pytest.raises(ValueError, match="max_tokens"):
            truncate_words_exact(
                df, "text", bad, strategy="end", encoder_factory=_factory
            )


def test_jvm_bpe_tokens_full_fixture_model_equivalence(spark):
    """Full-model equivalence: the JVM replace chain under ALL 200
    vendored merges equals MergesBPE on mixed prose (the unit goldens
    above use 3-4 merges; this exercises deep merge chains where
    later merges consume earlier merges' outputs)."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.training import _bpe_tokens_col

    merges = list(MergesBPE.from_merges_file(MERGES_FIXTURE).ranks)
    texts = [
        "The quarterly report shows increasing revenue.\n\n"
        "Operating expenses decreased; earnings per share grew 12%.",
        "training rain error or\nERROR", "", "aaa lll",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select("text", _bpe_tokens_col(F.col("text"), merges).alias("tk")).collect()
    enc = MergesBPE(merges)
    for r in got:
        py = [enc._tok[i] for i in enc.encode(r["text"])]
        assert list(r["tk"]) == (py or [""])


def test_jvm_bpe_merge_count_guard():
    """Above the measured Catalyst stack limit the JVM chain refuses
    loudly (500 merges StackOverflows plan build) and points to the
    Arrow MergesBPE path."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.training import _bpe_tokens_col

    merges = [(f"a{i}", f"b{i}") for i in range(300)]
    with _pytest.raises(ValueError, match="MergesBPE"):
        _bpe_tokens_col(F.lit("x"), merges)


def test_jvm_bpe_tokens_frozen_fuzz_parity(spark):
    """Frozen-seed fuzz (one Spark job): 40 generated texts mixing
    newlines/CRLF/repeated chars/unicode/punctuation runs, under a
    merge list that includes same-sided and chained pairs, must
    tokenize identically in the JVM chain and MergesBPE and
    reassemble losslessly. Seeded+frozen so failures reproduce."""
    import random

    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.training import _bpe_tokens_col

    # causally ordered (t+h before th+e) — _bpe_tokens_col now
    # asserts the trained-list precondition (round-9 advice #1)
    merges = [("e", "r"), ("o", "r"), ("i", "n"), ("l", "l"),
              ("ll", "ll"), ("a", "a"), ("er", "s"), ("t", "h"),
              ("th", "e")]
    rng = random.Random(90210)
    alphabet = list("aberlinots") + [" ", "\n", "\r\n", ".", ",", "!",
                                     "É", "7", "L", "a" * 4, "ll", "er "]
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: list(r["tk"]) for r in df.select(
        "i", _bpe_tokens_col(F.col("text"), merges).alias("tk")).collect()}
    enc = MergesBPE(merges)
    for i, t in enumerate(texts):
        py = [enc._tok[x] for x in enc.encode(t)]
        assert got[i] == (py or [""]), (i, repr(t))
        assert "".join(got[i]) == t, (i, repr(t))


def test_from_merges_lines_rejects_malformed_line():
    """Round-9 advice #2: a malformed merges line must raise a clear
    parse error naming the line, not a bare unpack ValueError."""
    import pytest

    with pytest.raises(ValueError, match=r"line 3.*'a b c'"):
        MergesBPE.from_merges_lines(["# ok", "a b", "a b c"])
    with pytest.raises(ValueError, match="line 1"):
        MergesBPE.from_merges_lines(["ab"])


def test_jvm_bpe_rejects_non_causal_merge_list():
    """Round-9 advice #1: _bpe_tokens_col's one-pass-per-merge chain
    equals rank-greedy BPE only for causally-ordered (trained) merge
    lists; a hand-built list referencing a later merge's output must
    be rejected loudly instead of silently diverging from MergesBPE."""
    import pytest

    from finmapreduce_spark.queries.training import _bpe_tokens_col
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="causally-ordered"):
        _bpe_tokens_col(F.lit("abb"), [("a", "bb"), ("b", "b")])
    # trained-order lists still pass (b+b first, then a+bb)
    _bpe_tokens_col(F.lit("abb"), [("b", "b"), ("a", "bb")])


def test_vocab_fixture_regenerates_byte_identically():
    """The committed 4,096-merge vocab fixture is exactly what
    tools/make_vocab_bpe_fixture.py's pure-Python trainer twin emits
    over the embedded corpus (prose + deterministic morpheme
    compounds) — regeneration is a no-op. Fast full-length guard; the
    Spark-side semantics pin is the prefix test below plus the
    tools/bpe_batch_study.py 4,079-merge Spark↔Python certification."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import make_vocab_bpe_fixture as mk

    regenerated = mk.train_batched(mk.FULL_CORPUS, mk.TRAIN_ROUNDS)[
        : mk.N_MERGES
    ]

    fixture_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "finmapreduce_spark", "resources", "vocab_bpe_merges.txt")
    fixture = list(MergesBPE.from_merges_file(fixture_path).ranks)
    assert len(fixture) == mk.N_MERGES == 4096
    assert regenerated == fixture


def test_spark_batched_trainer_reproduces_vocab_fixture_prefix(spark):
    """The vendored vocab fixture is trained by the pure-Python twin
    of the distributed batched trainer. This pins the REAL Spark
    trainer (rounds of one pair-count shuffle + bounded candidate
    collect + full-closure greedy batch) against a PREFIX of that
    file over the same embedded corpus — round k depends only on
    rounds < k, so a shorter run is exactly a prefix of a longer one,
    and a bounded round count keeps the pin affordable while still
    crossing the 256-merge JVM replace-chain envelope. If either
    side's semantics drift (candidate window, tie order, closure
    rule), the lists diverge at the first differing pick."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from make_vocab_bpe_fixture import BATCH_M, CAND_WINDOW, FULL_CORPUS

    from finmapreduce_spark.queries.training import _bpe_train_batched

    pin_rounds = 20  # 20 rounds x up-to-16 picks ≈ 320 merges
    docs = spark.createDataFrame([(FULL_CORPUS,)], "text string")
    rows, toks = _bpe_train_batched(
        spark, sf_dir=None, rounds=pin_rounds, batch=BATCH_M, docs=docs,
        cand_window=CAND_WINDOW,
    )
    toks.unpersist()
    got = [tuple(r[1].split(" ")) for r in sorted(rows)]

    fixture_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "finmapreduce_spark", "resources", "vocab_bpe_merges.txt")
    fixture = list(MergesBPE.from_merges_file(fixture_path).ranks)
    assert len(got) > 256  # beyond the JVM replace-chain envelope
    assert got == fixture[: len(got)]
