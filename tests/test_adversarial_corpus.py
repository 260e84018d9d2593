"""Totality certification: every catalog query must RUN (not crash)
on a corpus containing the document pathologies a real 100 TB crawl
certainly contains — empty text, NULL text (failed parses), docs
shorter than the shingle/gram sizes, whitespace-only rows, digit-only
rows, a single word repeated thousands of times, mixed unicode,
embedded newlines/tabs, one multi-KB "word", and quote/injection
characters. The driver and tests run ANSI-on (the Spark 4 default),
where partial expressions THROW instead of yielding NULL — so any
unguarded element_at / division / cast is a crash on real data even
though the well-formed fixture corpus never triggers it. This caught
two live bugs when first run: the shingle builders' out-of-bounds
element_at on sub-3-word docs and sample_weighted's ln(u)/0 on
zero-length docs.

Correctness on the adversarial rows is pinned separately where the
semantics are crisp (test_properties short-doc shingles); here the
contract is totality of the whole surface.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from finmapreduce_spark.queries import all_queries

ADV_DOCS = [
    (100001, "", "en", "adv"),
    (100002, "one", "en", "adv"),
    (100003, "two words", "en", "adv"),
    (100004, "   ", "en", "adv"),
    (100005, "12345 67890 11 22 33", "en", "adv"),
    (100006, ("spam " * 1000).strip(), "en", "adv"),
    (100007, "naïve café — emoji \U0001f389 mixed ünïcode text here", "de", "adv"),
    (100008, "line\nbreaks\tand\ttabs\nmix\nhere now ok", "en", "adv"),
    (100009, "x" * 5000, "en", "adv"),
    (100010, "-5 +3.2e10 NaN Infinity -0.0 1/0 £$€", "en", "adv"),
    (100011, None, "en", "adv"),
    (100012, "'); DROP TABLE documents;-- <script> \" quote ` tick", "en", "adv"),
]


@pytest.fixture(scope="module")
def adv_dir(sf_dir, tmp_path_factory):
    """The base fixture tables with the adversarial dozen APPENDED to
    documents (appended, not replacing: iterative trainers legitimately
    require a non-degenerate corpus; the point is that poison rows in a
    healthy corpus must not kill the job)."""
    out = tmp_path_factory.mktemp("advdata")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE adv(doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR)"
    )
    con.executemany("INSERT INTO adv VALUES (?,?,?,?)", ADV_DOCS)
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{sf_dir}/documents.parquet'
          UNION ALL
          SELECT doc_id, text, lang, source,
                 coalesce(length(text), 0) AS n_chars
          FROM adv
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        os.symlink(f"{sf_dir}/{t}.parquet", f"{out}/{t}.parquet")
    return str(out)


def test_catalog_total_on_adversarial_corpus(spark, adv_dir):
    failures = []
    for name, spec in all_queries().items():
        try:
            assert spec.spark(spark, adv_dir).count() >= 0
        except Exception as e:  # noqa: BLE001 — we want the full census
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
        finally:
            spark.catalog.clearCache()
    assert not failures, "\n".join(failures)
