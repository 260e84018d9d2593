"""Per-doc occurrence cap in the passage-dedup family (M94): a gram
repeated pathologically INSIDE one document (machine-generated logs,
OCR stutter, boilerplate headers glued into one file) must not grow
the occurrence lists / probe-join fan-out by the repeat count. The cap
keeps the FIRST PASSAGE_MAX_OCC positions per (gram, doc) — on clean
text it is a no-op (the synthetic corpus' max within-doc repeat is 1,
so the catalog oracle tests also pin neutrality there).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from finmapreduce_spark.queries.dedup import (
    PASSAGE_K,
    PASSAGE_MAX_OCC,
    _capped_occurrences,
    incremental_passage_spans,
    passage_gram_store,
    passage_gram_table,
    passage_spans_of,
)

# 50 repeats of a 6-word block: every one of the 6 gram families
# ("x y z w v u", "y z w v u x", ...) recurs ~49x within the doc.
_PATHOLOGICAL = ("x y z w v u " * 50).strip()
_SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def _docs_df(spark):
    return spark.createDataFrame(
        [
            (1, _SHARED + " filler1 one two three"),
            (2, _SHARED + " other4 five six seven"),
            (3, _PATHOLOGICAL),
            (4, _PATHOLOGICAL),
        ],
        "doc_id long, text string",
    )


def test_capped_occurrences_keep_first_n_positions(spark):
    grams = passage_gram_table(_docs_df(spark).filter("doc_id = 3"))
    per = _capped_occurrences(grams).collect()
    assert per, "gram table empty"
    assert max(len(r.poss) for r in per) == PASSAGE_MAX_OCC
    for r in per:
        assert r.poss == sorted(r.poss)
        # first-N semantics: the kept positions are the smallest ones
        all_pos = [
            x.pos
            for x in grams.filter(
                (F.col("h") == r.h) & (F.col("doc_id") == r.doc_id)
            ).collect()
        ]
        assert r.poss == sorted(all_pos)[: PASSAGE_MAX_OCC]


def test_pathological_repeat_bounded_but_clean_passage_exact(spark):
    spans = passage_spans_of(_docs_df(spark)).collect()
    clean = [r for r in spans if (r.doc_a, r.doc_b) == (1, 2)]
    # the shared 12-word passage is found exactly, cap untouched
    assert [(r.a_start, r.b_start, r.n_words) for r in clean] == [(1, 1, 12)]
    path = [r for r in spans if (r.doc_a, r.doc_b) == (3, 4)]
    assert path, "repeated block must still be detected as duplicated"
    # uncapped, the diag-0 run alone would span the whole 300-word doc;
    # capped, matches are confined to the first MAX_OCC repeats
    bound = PASSAGE_MAX_OCC * PASSAGE_K + PASSAGE_K
    assert max(r.a_start + r.n_words for r in path) <= bound + 1


def test_gram_store_and_probe_are_capped(spark):
    docs = _docs_df(spark)
    store = passage_gram_store(docs.filter("doc_id = 4"))
    per_doc_counts = (
        store.groupBy("h", "doc_id").count().agg(F.max("count")).first()[0]
    )
    assert per_doc_counts == PASSAGE_MAX_OCC
    spans = incremental_passage_spans(
        passage_gram_table(docs.filter("doc_id = 3")), store
    ).collect()
    assert spans, "probe must still find the duplicated block"
    bound = PASSAGE_MAX_OCC * PASSAGE_K + PASSAGE_K
    assert max(r.a_start + r.n_words for r in spans) <= bound + 1
