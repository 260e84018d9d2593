"""Totality certification: every catalog query must RUN (not crash)
on tables containing the pathologies 100 TB of real data certainly
contain — documents with empty/NULL text, sub-shingle-length docs,
whitespace-only and digit-only rows, a word repeated 1000×, mixed
unicode, a 5 KB single "word", quote/injection characters; embeddings
with NULL vectors and all-zero vectors (failed embedding jobs);
events with NULL timestamps/users/values and JSON props whose typed
value is non-numeric. The driver and tests run ANSI-on (the Spark 4
default), where partial expressions THROW instead of yielding NULL —
any unguarded element_at / division / cast is a job-killer on real
data even though the well-formed fixture corpus never triggers it.

Evaluation is forced through the noop SINK, not count(): count()
column-prunes projections, so an expression crash in a computed
output column would go unseen (this distinction caught the cosine
family — their counts pass while their values throw).

First full run caught four live bug classes: the shingle builders'
out-of-bounds element_at on sub-3-word docs, sample_weighted's
ln(u)/0 on zero-length docs, the whole cosine/ANN family's
DIVIDE_BY_ZERO on zero-norm vectors (ANSI throws even for doubles),
and the JSON-extract queries' CAST_INVALID_INPUT on non-numeric JSON
values. All fixed with engine-equivalent guards.
"""

from __future__ import annotations

import duckdb
import pytest

from finmapreduce_spark.queries import all_queries

from tools.adversarial_corpus import build_adversarial_corpus  # noqa: E402


@pytest.fixture(scope="module")
def adv_dir(sf_dir, tmp_path_factory):
    """The base fixture tables with poison rows APPENDED (appended,
    not replacing: iterative trainers legitimately require a
    non-degenerate corpus; the point is that poison rows in a healthy
    corpus must not kill the job). The builder is shared with the
    standalone poisoned sweep (tools/adversarial_corpus.py — see its
    docstring for the CLI recipe)."""
    out = tmp_path_factory.mktemp("advdata")
    return build_adversarial_corpus(sf_dir, str(out))


# slow (≈5 min): full-catalog TOTALITY sweep on the adversarial corpus.
# The per-query engine-parity tests above run by default and cover the
# same pathological data value-exactly; this sweep only adds "every
# other catalog entry still ANALYZES there".
@pytest.mark.slow
def test_catalog_total_on_adversarial_corpus(spark, adv_dir):
    failures = []
    for name, spec in all_queries().items():
        try:
            # noop sink forces FULL evaluation of every output column
            spec.spark(spark, adv_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — we want the full census
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
        finally:
            spark.catalog.clearCache()
    assert not failures, "\n".join(failures)


# The queries whose Spark/DuckDB values DIVERGED on poison rows when
# the parity sweep first ran (NULL-text docs flowing through
# concat_ws-vs-|| NULL handling, text-nullness-vs-existence merge
# classification, NULLS FIRST/LAST window ordering, lenient-vs-
# throwing JSON parsing). Each got an engine-equivalent alignment;
# this pins them. The FULL parity sweep is
# `FMR_COMPARE_SF_DIR=<adv dir> python tools/compare.py`.
_PARITY_PINNED = [
    "merge_upsert",
    "j_levenshtein_best_match",
    "f3_truncate_start",
    "f4_truncate_end",
    "truncation_e2e_answers",
    "truncation_stats",
    "u6_hashing_bow_cosine",
    "f7_json_extract",
    "events_json_extract",
    "dedup_minhash_signature",
    "sample_weighted",
    "dedup_simhash_pairs",
    # second review round (pairwise-NULL docs, NaN/NULL-element
    # vectors, NULL-ts events):
    "dedup_ngram_jaccard",
    "contamination_ngram_overlap",
    "embedding_quantize_int8",
    "u6_pair_cosine",
    "ann_bruteforce_topk",
    "sessionize_events",
    "scd2_event_type_history",
    "scd2_point_in_time_lookup",
    # round-4 additions (NULL-text and sub-bigram docs must drop
    # identically; overflow-k rows exercise the try_cast contract):
    "text_bigram_lm_quality",
    "bpe_train_merges_batched",
    # round-6: the CSV round-trip DIVERGED on poison (Spark's CSV
    # writer trims whitespace inside quotes by default — an
    # all-whitespace text silently became ''); the trigram scorer
    # shares the bigram's NULL/short-doc drop semantics
    "documents_csv_scan",
    "documents_orc_scan",
    "text_trigram_interp_quality",
]


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{adv_dir}/{t}.parquet'")
    yield con
    con.close()


def test_modal_dim_election_ignores_null_element_vectors(
    spark, tmp_path_factory
):
    """A MAJORITY cluster of NULL-element vectors at an off-modal
    length must not flip the modal-dim election in either engine
    (ADVICE r03): emb_table excludes NULL-element rows before the
    mode, and EMB_SQL's subquery must use the identical row set —
    without the subquery filter DuckDB elects dim 6 here and returns
    zero rows while Spark returns the three valid dim-4 vectors."""
    from finmapreduce_spark.queries.dedup import EMB_SQL, emb_table

    out = tmp_path_factory.mktemp("modal")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES
          (1, [0.1, 0.2, 0.3, 0.4]::FLOAT[], 0),
          (2, [0.5, 0.6, 0.7, 0.8]::FLOAT[], 0),
          (3, [0.9, 0.1, 0.2, 0.3]::FLOAT[], 1),
          (4, [NULL::FLOAT, 1.0, 1.0, 1.0, 1.0, 1.0]::FLOAT[], 1),
          (5, [NULL::FLOAT, 2.0, 2.0, 2.0, 2.0, 2.0]::FLOAT[], 1),
          (6, [NULL::FLOAT, 3.0, 3.0, 3.0, 3.0, 3.0]::FLOAT[], 1),
          (7, [NULL::FLOAT, 4.0, 4.0, 4.0, 4.0, 4.0]::FLOAT[], 1),
          (8, [NULL::FLOAT, 5.0, 5.0, 5.0, 5.0, 5.0]::FLOAT[], 1)
        ) t(vec_id, embedding, label))
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{out}/embeddings.parquet'"
    )
    spark_ids = sorted(
        r.vec_id for r in emb_table(spark, str(out)).select("vec_id").collect()
    )
    duck_ids = sorted(
        r[0] for r in con.execute(f"SELECT vec_id FROM ({EMB_SQL})").fetchall()
    )
    con.close()
    assert spark_ids == [1, 2, 3]
    assert duck_ids == spark_ids


@pytest.mark.parametrize("name", _PARITY_PINNED)
def test_engine_parity_on_adversarial_corpus(spark, adv_dir, adv_duck, name):
    from tests.oracle_utils import assert_matches_oracle

    spec = all_queries()[name]
    assert_matches_oracle(
        spec.spark(spark, adv_dir), adv_duck, spec.oracle, min_rows=0
    )
    spark.catalog.clearCache()
