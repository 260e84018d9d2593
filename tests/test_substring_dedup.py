"""Exact substring dedup (winnowing + gram verify): planted
cross-document verbatim spans at arbitrary offsets, boundary-length
behavior, and a frozen-seed fuzz against a brute-force Python oracle
— the adversarial cases the templated synthetic corpus never covers.
Reference setting: Lee et al. 2021 (suffix-array dedup);
fingerprinting: Schleimer et al. 2003 (winnowing window guarantee
t = w + k - 1, zero false negatives)."""

from __future__ import annotations

import random
import string

from finmapreduce_spark.queries.dedup import (
    SUBSTR_K,
    SUBSTR_L,
    exact_substring_pairs,
)


def _rand_text(rng, n):
    # alphanumeric + space; high-entropy so accidental L-grams
    # essentially never collide
    return "".join(rng.choice(string.ascii_letters + "   ") for _ in range(n))


def _pairs(spark, rows, min_len=SUBSTR_L, k=SUBSTR_K):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["n_shared_grams"]
        for r in exact_substring_pairs(docs, min_len, k).collect()
    }
    spark.catalog.clearCache()
    return out


def test_planted_span_found_at_arbitrary_offsets(spark):
    rng = random.Random(4040)
    span = _rand_text(rng, SUBSTR_L)  # exactly L chars
    rows = [
        (1, _rand_text(rng, 120) + span + _rand_text(rng, 200)),
        (2, span + _rand_text(rng, 310)),  # span at offset 0
        (3, _rand_text(rng, 290) + span),  # span at the very end
        (4, _rand_text(rng, 400)),  # no span
    ]
    got = _pairs(spark, rows)
    # exactly-L span -> exactly one shared L-gram per sharing pair
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_span_one_char_short_is_not_a_pair(spark):
    rng = random.Random(4041)
    span = _rand_text(rng, SUBSTR_L - 1)  # L-1: must NOT pair
    rows = [
        (1, _rand_text(rng, 100) + span + _rand_text(rng, 100)),
        (2, _rand_text(rng, 50) + span + _rand_text(rng, 150)),
    ]
    assert _pairs(spark, rows) == {}


def test_long_span_counts_all_contained_grams(spark):
    rng = random.Random(4042)
    extra = 30
    span = _rand_text(rng, SUBSTR_L + extra)
    rows = [
        (1, span + _rand_text(rng, 100)),
        (2, _rand_text(rng, 77) + span),
    ]
    # a span of length L+e contains e+1 distinct L-grams
    assert _pairs(spark, rows) == {(1, 2): extra + 1}


def test_short_and_null_docs_are_total(spark):
    rng = random.Random(4043)
    rows = [(1, None), (2, ""), (3, "tiny"), (4, _rand_text(rng, 200))]
    assert _pairs(spark, rows) == {}


def test_internal_repetition_never_self_pairs(spark):
    rng = random.Random(4044)
    span = _rand_text(rng, SUBSTR_L)
    rows = [(1, span + "x" + span + "y" + span), (2, _rand_text(rng, 100))]
    assert _pairs(spark, rows) == {}


def test_frozen_fuzz_matches_bruteforce(spark):
    """20 docs, random planted spans (length L-3 .. L+20) copied
    between random doc pairs at random offsets; operator output must
    equal the brute-force all-grams Python oracle exactly."""
    rng = random.Random(90210)
    texts = {i: list(_rand_text(rng, rng.randint(0, 400))) for i in range(20)}
    for _ in range(12):
        a, b = rng.sample(range(20), 2)
        ln = rng.randint(SUBSTR_L - 3, SUBSTR_L + 20)
        span = _rand_text(rng, ln)
        for d in (a, b):
            t = texts[d]
            pos = rng.randint(0, len(t))
            texts[d] = t[:pos] + list(span) + t[pos:]
    rows = [(i, "".join(t)) for i, t in texts.items()]

    def grams(s):
        return {
            s[i : i + SUBSTR_L]
            for i in range(0, max(0, len(s) - SUBSTR_L + 1))
        }

    expect = {}
    for i, (ida, ta) in enumerate(rows):
        for idb, tb in rows[i + 1 :]:
            shared = grams(ta) & grams(tb)
            if shared:
                lo, hi = min(ida, idb), max(ida, idb)
                expect[(lo, hi)] = len(shared)
    assert expect, "fuzz should plant at least one real pair"
    assert _pairs(spark, rows) == expect


def _coverage(spark, rows, min_len=SUBSTR_L, k=SUBSTR_K):
    from finmapreduce_spark.queries.dedup import (
        substring_duplication_coverage,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["covered_chars"], r["n_dup_positions"],
                      r["dup_coverage"])
        for r in substring_duplication_coverage(docs, min_len, k).collect()
    }
    spark.catalog.clearCache()
    return out


def test_coverage_exact_span_arithmetic(spark):
    """A shared span of length L+e yields e+1 dup positions whose
    fixed-length intervals union to exactly e+L covered chars."""
    rng = random.Random(7001)
    e = 25
    span = _rand_text(rng, SUBSTR_L + e)
    head, tail = _rand_text(rng, 63), _rand_text(rng, 90)
    rows = [(1, head + span + tail), (2, span)]
    got = _coverage(spark, rows)
    n1 = len(head) + len(span) + len(tail)
    assert got[1] == (SUBSTR_L + e, e + 1,
                      round((SUBSTR_L + e) / n1, 6))
    # doc 2 IS the span: fully covered
    assert got[2] == (SUBSTR_L + e, e + 1, 1.0)


def test_coverage_disjoint_spans_sum(spark):
    rng = random.Random(7002)
    s1, s2 = _rand_text(rng, SUBSTR_L), _rand_text(rng, SUBSTR_L + 10)
    gap = _rand_text(rng, 70)
    rows = [
        (1, s1 + gap + s2),
        (2, s1 + _rand_text(rng, 120)),
        (3, _rand_text(rng, 55) + s2),
    ]
    got = _coverage(spark, rows)
    # doc 1: two disjoint covered spans -> their lengths sum
    assert got[1][0] == len(s1) + len(s2)
    assert got[1][1] == 1 + 11  # 1 position for s1, 11 for s2


def test_coverage_zero_and_edge_docs(spark):
    rng = random.Random(7003)
    rows = [(1, _rand_text(rng, 200)), (2, None), (3, ""), (4, "abc")]
    got = _coverage(spark, rows)
    assert got[1] == (0, 0, 0.0)
    assert got[2] == (0, 0, None)  # null text -> 0 chars -> null ratio
    assert got[3] == (0, 0, None)
    assert got[4] == (0, 0, 0.0)


def test_coverage_internal_repetition_not_counted(spark):
    """A span repeated WITHIN one doc but present in no other doc is
    not cross-document duplication."""
    rng = random.Random(7004)
    span = _rand_text(rng, SUBSTR_L)
    rows = [(1, span + "x" + span), (2, _rand_text(rng, 150))]
    got = _coverage(spark, rows)
    assert got[1] == (0, 0, 0.0)


def test_incremental_equals_batch_restriction(spark):
    """Twin invariant: the incremental probe (delta vs history) must
    equal the batch pair query restricted to cross-partition pairs —
    same planted spans, two routes, one answer."""
    from finmapreduce_spark.queries.dedup import (
        exact_substring_pairs,
        incremental_substring_pairs,
    )

    rng = random.Random(8001)
    span1 = _rand_text(rng, SUBSTR_L + 7)
    span2 = _rand_text(rng, SUBSTR_L)
    rows = [
        (0, span1 + _rand_text(rng, 80)),            # incoming (id%2==0)
        (2, _rand_text(rng, 50) + span2),            # incoming, hits 3
        (4, _rand_text(rng, 200)),                   # incoming, clean
        (1, _rand_text(rng, 30) + span1),            # history, hits 0
        (3, span2 + _rand_text(rng, 120)),           # history, hits 2
        (5, span1 + span2),                          # history, hits 0+2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    incoming = docs.filter("doc_id % 2 = 0")
    history = docs.filter("doc_id % 2 <> 0")
    inc = {
        (r["doc_id"], r["hist_id"]): r["n_shared_grams"]
        for r in incremental_substring_pairs(incoming, history).collect()
    }
    batch = {
        (r["doc_a"], r["doc_b"]): r["n_shared_grams"]
        for r in exact_substring_pairs(docs).collect()
    }
    spark.catalog.clearCache()
    cross = {
        (a, b): v
        for (a, b), v in batch.items()
        if (a % 2 == 0) != (b % 2 == 0)
    }
    # batch pairs are (min, max); incremental keys are (inc, hist)
    normalized = {
        ((a, b) if a % 2 == 0 else (b, a)): v for (a, b), v in cross.items()
    }
    assert inc == normalized
    assert (0, 1) in inc and (0, 5) in inc and (2, 3) in inc
    assert not any(d == 4 for d, _ in inc)


def test_substring_clusters_transitive_components(spark):
    """A->B and B->C verbatim overlaps (A and C share nothing) must
    cluster all three together with min-id canonical — CC transitivity
    over the pair graph."""
    from finmapreduce_spark.queries.dedup import (
        connected_components,
        exact_substring_pairs,
    )

    rng = random.Random(9001)
    s_ab = _rand_text(rng, SUBSTR_L)
    s_bc = _rand_text(rng, SUBSTR_L)
    rows = [
        (10, s_ab + _rand_text(rng, 100)),
        (11, _rand_text(rng, 40) + s_ab + s_bc),
        (12, s_bc + _rand_text(rng, 90)),
        (13, _rand_text(rng, 260)),  # isolated: absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = exact_substring_pairs(docs).select("doc_a", "doc_b")
    labels = {
        r["doc_id"]: r["label"] for r in connected_components(pairs).collect()
    }
    spark.catalog.clearCache()
    assert labels == {10: 10, 11: 10, 12: 10}


def test_spans_exact_boundaries_and_offsets(spark):
    """Maximal spans report 1-based offsets in BOTH docs and the full
    span length (not just >= L): planted span of L+e at known offsets
    must come back as exactly one island with those coordinates."""
    from finmapreduce_spark.queries.dedup import exact_substring_spans

    rng = random.Random(11001)
    e = 17
    span = _rand_text(rng, SUBSTR_L + e)
    head_a, head_b = _rand_text(rng, 53), _rand_text(rng, 8)
    rows = [
        (1, head_a + span + _rand_text(rng, 60)),
        (2, head_b + span + _rand_text(rng, 33)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        tuple(r)
        for r in exact_substring_spans(docs)
        .select("doc_a", "doc_b", "a_start", "b_start", "span_len")
        .collect()
    ]
    spark.catalog.clearCache()
    assert got == [(1, 2, len(head_a) + 1, len(head_b) + 1, SUBSTR_L + e)]


def test_spans_two_alignments_report_separately(spark):
    """The same span planted TWICE in one doc matches the other doc's
    single copy on two diagonals — two distinct maximal spans, both
    full length."""
    from finmapreduce_spark.queries.dedup import exact_substring_spans

    rng = random.Random(11002)
    span = _rand_text(rng, SUBSTR_L)
    gap = _rand_text(rng, 45)
    rows = [
        (1, span + gap + span),
        (2, _rand_text(rng, 20) + span + _rand_text(rng, 70)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["a_start"], r["b_start"], r["span_len"])
        for r in exact_substring_spans(docs).collect()
    )
    spark.catalog.clearCache()
    second = 1 + SUBSTR_L + len(gap)
    assert got == [(1, 21, SUBSTR_L), (second, 21, SUBSTR_L)]


def test_substring_trim_removes_only_nonkeeper_copies(spark):
    """Planted geometry: doc 1 and doc 2 share one >=L verbatim block,
    docs 3/4/5 are unique. The trim must (a) leave the keeper (lower
    id) byte-identical, (b) cut the FULL maximal shared span from the
    higher-id doc so no shared L-gram survives there, (c) pass unique
    docs through unchanged, and (d) report exact removed-char
    accounting."""
    from finmapreduce_spark.queries.dedup import SUBSTR_L, substring_trim

    block = "B" * (SUBSTR_L + 25)  # one maximal span, longer than L
    # flank boundaries DIFFER between the two docs (x+ vs _~), so the
    # maximal shared span is exactly the block — a shared boundary
    # char (e.g. a space on both sides) would legitimately extend it
    rows = [
        (1, "left flank one x" + block + "+right flank one"),
        (2, "totally different lead_" + block + "~different tail"),
        (3, "unique document three with nothing shared at all here"),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_trim(docs).collect()}
    spark.catalog.clearCache()
    assert set(out) == {1, 2, 3, 4, 5}
    # keeper untouched
    assert out[1]["text_trimmed"] == rows[0][1]
    assert out[1]["n_removed"] == 0 and out[1]["n_cut_spans"] == 0
    # non-keeper: the whole maximal span is gone, flanks survive
    t2 = out[2]["text_trimmed"]
    assert block[:SUBSTR_L] not in t2
    assert out[2]["n_removed"] == len(block)
    assert out[2]["n_cut_spans"] == 1
    assert t2 == "totally different lead_" + "~different tail"
    # uniques / empties unchanged
    assert out[3]["text_trimmed"] == rows[2][1]
    assert out[4]["text_trimmed"] == "" and out[5]["text_trimmed"] == ""
    for d in (3, 4, 5):
        assert out[d]["n_removed"] == 0


def test_substring_trim_merges_overlapping_spans(spark):
    """Two distinct shared blocks that OVERLAP inside the victim doc
    (each shared with a different keeper) must merge into one removal
    interval — chars in the overlap are removed once, and the kept
    segments reassemble in order."""
    from finmapreduce_spark.queries.dedup import SUBSTR_L, substring_trim

    a = "A" * SUBSTR_L
    b = "B" * SUBSTR_L
    overlap = a + b  # victim carries A-block immediately before B-block
    # boundary chars are UNIQUE per doc — any shared flank char would
    # legitimately extend the maximal span (the first planted-span
    # test documents that behavior on purpose)
    rows = [
        (1, "keeperone(" + a + ")one"),
        (2, "keepertwo[" + b + "]two"),
        (3, "victim{" + overlap + "}end"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_trim(docs).collect()}
    spark.catalog.clearCache()
    assert out[1]["text_trimmed"] == rows[0][1]
    assert out[2]["text_trimmed"] == rows[1][1]
    t3 = out[3]["text_trimmed"]
    assert t3 == "victim{" + "}end"
    assert out[3]["n_removed"] == len(overlap)
    assert out[3]["n_cut_spans"] == 1  # touching intervals merged
