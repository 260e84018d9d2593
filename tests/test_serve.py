"""Single-QA serving API (§3.2 webapp parity)."""

from __future__ import annotations

import pytest

from finmapreduce_spark.plans.mapreduce import MapReduceConfig
from finmapreduce_spark.serve import PREVIEW_CHARS, answer_single, preview


@pytest.fixture()
def doc_file(tmp_path):
    p = tmp_path / "report.md"
    p.write_text("Quarterly revenue rose twelve percent on cloud growth. " * 50)
    return str(p)


def test_answer_single(spark, doc_file):
    out = answer_single(
        spark,
        doc_file,
        "How much did revenue rise?",
        cfg=MapReduceConfig(chunk_size=256, chunk_overlap=32),
    )
    assert out["error"] is None
    assert out["answer"] and isinstance(out["answer"], str)
    assert out["n_chunks"] > 1
    assert out["input_tokens"] > 0


def test_answer_single_empty_doc(spark, tmp_path):
    p = tmp_path / "empty.md"
    p.write_text("   ")
    out = answer_single(spark, str(p), "Anything?")
    assert out["error"] == "empty document"
    assert out["answer"] is None


def test_preview(spark, doc_file):
    out = preview(spark, doc_file)
    assert out["doc_name"] == "report.md"
    assert len(out["preview"]) == PREVIEW_CHARS
    assert out["n_chars"] > PREVIEW_CHARS
