"""Source/sink layer tests (S1–S13) over tmp fixture files."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from finmapreduce_spark.sources.cache import ParseCache
from finmapreduce_spark.sources.readers import (
    build_path_catalog,
    load_financebench,
    load_finqa,
    load_markdown_documents,
    load_upload,
)
from finmapreduce_spark.sources.sinks import save_results


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fmr_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_load_financebench_jsonl(spark, tmpdir):
    rows = [
        {
            "financebench_id": "fb1",
            "doc_name": "APPLE_2020",
            "question": "q1",
            "answer": "a1",
            "justification": None,  # → coalesced default
            "evidence": [{"evidence_text": "e1"}, {"evidence_text": "e2"}],
            "question_type": "metrics-generated",
            "question_reasoning": None,
        },
        {
            "financebench_id": "fb2",
            "doc_name": "MSFT_2019",
            "question": "q2",
            "answer": "a2",
            "justification": "because",
            "evidence": [],
            "question_type": "domain-relevant",
            "question_reasoning": "r",
        },
    ]
    path = f"{tmpdir}/fb.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    df = load_financebench(spark, path)
    got = {r["question"]: r.asDict() for r in df.collect()}
    assert got["q1"]["justification"] == "No justification provided"
    assert got["q1"]["evidence"] == ["e1", "e2"]  # flattened
    assert got["q2"]["justification"] == "because"
    assert load_financebench(spark, path, num_samples=1).count() == 1  # S3


def test_load_finqa_json_array(spark, tmpdir):
    path = f"{tmpdir}/finqa.json"
    with open(path, "w") as f:
        json.dump(
            [
                {"doc_name": "AAPL_2019.md", "question": "q", "answer": "a",
                 "filename": None, "explanation": None},
            ],
            f,
        )
    row = load_finqa(spark, path).collect()[0]
    assert row["filename"] == "" and row["explanation"] == ""  # '' defaults


def test_markdown_corpus_and_catalog(spark, tmpdir):
    os.makedirs(f"{tmpdir}/md")
    for name, text in [("AAPL_2019.md", "# Apple\ntable | cell"), ("MSFT_2020.md", "# MSFT")]:
        with open(f"{tmpdir}/md/{name}", "w") as f:
            f.write(text)
    docs = load_markdown_documents(spark, f"{tmpdir}/md/*.md")
    got = {r["doc_name"]: r["content"] for r in docs.collect()}
    assert set(got) == {"AAPL_2019", "MSFT_2020"}
    assert "table | cell" in got["AAPL_2019"]

    cat = build_path_catalog(spark, [f"{tmpdir}/md", f"{tmpdir}/nonexistent"])
    assert {r["doc_name"] for r in cat.collect()} == {"AAPL_2019", "MSFT_2020"}


def test_upload_validation(spark, tmpdir):
    ok = f"{tmpdir}/doc.txt"
    with open(ok, "w") as f:
        f.write("content here")
    df = load_upload(spark, ok, "what?")
    assert df.count() == 1
    bad = f"{tmpdir}/doc.exe"
    with open(bad, "w") as f:
        f.write("x")
    with pytest.raises(ValueError, match="unsupported file type"):
        load_upload(spark, bad, "q")


def test_parse_cache_hits_and_misses(spark, tmpdir):
    cache = ParseCache(spark, f"{tmpdir}/cache")
    docs = spark.createDataFrame(
        [("d1", "raw one"), ("d2", "raw two")], "doc_name string, raw string"
    )
    parser = lambda c: F.upper(c)  # noqa: E731  stand-in for S4/S5 parse
    out1 = cache.get_or_parse(docs, parser, "fake", 512, 64)
    assert {r["content"] for r in out1.collect()} == {"RAW ONE", "RAW TWO"}
    # second run: both rows must come from cache (parse only misses)
    docs2 = spark.createDataFrame(
        [("d1", "IGNORED"), ("d3", "raw three")], "doc_name string, raw string"
    )
    out2 = {r["doc_name"]: r["content"] for r in cache.get_or_parse(
        docs2, parser, "fake", 512, 64).collect()}
    assert out2["d1"] == "RAW ONE"  # cache hit — raw NOT re-parsed
    assert out2["d3"] == "RAW THREE"  # miss parsed


def test_save_results_sink(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "a", 10, 5), (2, "b", 20, 7)],
        "qa_id long, llm_answer string, input_tokens long, output_tokens long",
    )
    out = save_results(df, tmpdir, config={"model": "mock"}, run_ts="20260813_000000")
    back = spark.read.json(out)
    assert back.count() == 2
    with open(f"{out}/_summary.json") as f:
        summary = json.load(f)
    assert summary["stats"]["total_input_tokens"] == 30
    assert summary["config"]["model"] == "mock"


def test_load_pdf_documents_fake_parser(spark, tmp_path):
    """S4/S5: binaryFile scan + mapInPandas parse; per-file failure
    becomes an error row, not a task failure."""
    import os

    from finmapreduce_spark.sources.readers import load_pdf_documents

    d = str(tmp_path)
    with open(os.path.join(d, "acme_2023.pdf"), "wb") as f:
        f.write(b"%PDF-1.4\nAcme Corp annual report 2023\x00\x01revenue up")
    with open(os.path.join(d, "beta_2022.pdf"), "wb") as f:
        f.write(b"%PDF-1.4\nBeta results\xff\xfe")
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("ignored by glob")

    docs = load_pdf_documents(spark, d, parser="fake")
    rows = {r["doc_name"]: r.asDict() for r in docs.collect()}
    assert set(rows) == {"acme_2023", "beta_2022"}
    assert "Acme Corp annual report 2023" in rows["acme_2023"]["content"]
    assert "\x00" not in rows["acme_2023"]["content"]
    assert rows["acme_2023"]["parse_error"] is None
    assert rows["acme_2023"]["parser"] == "fake"

    gated = load_pdf_documents(spark, d, parser="pypdf")
    err = {r["doc_name"]: r["parse_error"] for r in gated.collect()}
    assert all(e and "pypdf" in e for e in err.values())


def test_save_corpus_partition_pruning(spark, sf_dir, tmpdir):
    """Partitioned sink + pruned read-back: a lang predicate must reach
    the scan as a PartitionFilter, not a row filter."""
    from finmapreduce_spark.session import read_table
    from finmapreduce_spark.sources.sinks import save_corpus
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    out = f"{tmpdir}/corpus"
    save_corpus(docs, out, partition_by=("lang",))

    back = spark.read.parquet(out)
    en = back.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().explainString(
        en._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    assert en.count() == docs.filter(F.col("lang") == "en").count()
    assert back.count() == docs.count()


def test_load_financebench_corrupt_line(spark, tmpdir):
    """A malformed JSONL line must not fail the load: with the explicit
    schema it becomes an all-null row (PERMISSIVE), which the J1 join
    then turns into a typed 'document not found' error row — corrupt
    input degrades to an error answer, never a crashed job."""
    import json
    import os

    from finmapreduce_spark.sources.readers import load_financebench

    path = os.path.join(tmpdir, "qa.jsonl")
    good = {
        "financebench_id": "q1", "doc_name": "d1", "question": "Q?",
        "answer": "A", "justification": None,
        "evidence": [{"evidence_text": "e"}],
        "question_type": "t", "question_reasoning": None,
    }
    with open(path, "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps({**good, "financebench_id": "q2"}) + "\n")
    rows = load_financebench(spark, path).collect()
    assert len(rows) == 3
    by_doc = [r["doc_name"] for r in rows]
    assert by_doc.count("d1") == 2 and None in by_doc


def test_save_corpus_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two corpora bucketed on doc_id join with zero Exchange."""
    import uuid

    from pyspark.sql import functions as F

    from finmapreduce_spark.session import read_table
    from finmapreduce_spark.sources.sinks import save_corpus_bucketed

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    sfx = uuid.uuid4().hex[:8]
    a, b = f"corp_a_{sfx}", f"corp_b_{sfx}"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        save_corpus_bucketed(docs, a, str(tmp_path / "a"), n_buckets=4, sort_by="doc_id")
        save_corpus_bucketed(docs, b, str(tmp_path / "b"), n_buckets=4, sort_by="doc_id")
        j = spark.table(a).join(spark.table(b).withColumnRenamed("lang", "lang_b"), "doc_id")
        plan = j._jdf.queryExecution().explainString(
            j._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Exchange" not in plan
        assert j.count() == docs.count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {a}")
        spark.sql(f"DROP TABLE IF EXISTS {b}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_save_corpus_sorted_rowgroup_stats_are_tight(spark, sf_dir, tmp_path):
    """save_corpus_sorted must produce per-file monotone doc_id row
    groups (non-overlapping min/max), the property footer-stats
    skipping needs; and the range predicate must still push into the
    scan."""
    import glob

    import pyarrow.parquet as pq

    from finmapreduce_spark.session import read_table
    from finmapreduce_spark.sources.sinks import save_corpus_sorted

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "sorted_corpus")
    save_corpus_sorted(docs, out)

    files = glob.glob(f"{out}/lang=*/*.parquet")
    assert files
    checked = 0
    for fp in files:
        meta = pq.ParquetFile(fp).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.row_group(0).num_columns)
        }["doc_id"]
        prev_max = None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            assert st.min <= st.max
            if prev_max is not None:
                assert st.min >= prev_max  # non-overlapping: skippable
            prev_max = st.max
            checked += 1
    assert checked >= len(files)

    back = spark.read.parquet(out).filter(
        "doc_id >= 100 AND doc_id < 200 AND lang = 'en'"
    )
    jexec = back._jdf.queryExecution()
    plan = jexec.explainString(
        back._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
    assert "GreaterThanOrEqual(doc_id,100)" in plan
    assert back.count() == docs.filter(
        "doc_id >= 100 AND doc_id < 200 AND lang = 'en'"
    ).count()


def _touched_row_groups(pattern: str, lo, hi, col: str = "doc_id") -> tuple[int, int]:
    """(row groups a stats-respecting reader must touch, total row
    groups) for predicate lo <= col < hi over the parquet files
    matching ``pattern`` — exactly the footer-stats decision Spark's
    vectorized reader makes per row group."""
    import datetime
    import glob

    import pyarrow.parquet as pq

    def norm(v):
        # stats may be tz-aware (TIMESTAMP_MICROS) or naive (NTZ)
        # depending on the written logical type; compare in naive UTC
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v

    lo, hi = norm(lo), norm(hi)
    touched = total = 0
    for fp in glob.glob(pattern):
        meta = pq.ParquetFile(fp).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.row_group(0).num_columns)
        }[col]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            total += 1
            if norm(st.min) < hi and norm(st.max) >= lo:
                touched += 1
    return touched, total


def test_sorted_layout_measured_rowgroup_skip(spark, sf_dir, tmp_path):
    """The sorted layout's range-scan win, measured: with small row
    groups forced, a doc_id range touches a small fraction of the
    sorted layout's row groups but (nearly) all of a shuffled layout's
    — same data, same predicate, same row-group size."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.session import read_table
    from finmapreduce_spark.sources.sinks import save_corpus_sorted

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    rg_bytes = 4 * 1024
    sorted_out = str(tmp_path / "sorted")
    save_corpus_sorted(docs, sorted_out, row_group_bytes=rg_bytes)
    shuffled_out = str(tmp_path / "shuffled")
    (
        docs.repartition(F.col("lang"))
        .sortWithinPartitions("lang", F.xxhash64("doc_id"))
        .write.option("parquet.block.size", str(rg_bytes))
        .option("parquet.page.size.row.check.min", "10")
        .option("parquet.page.size.row.check.max", "10")
        .partitionBy("lang")
        .parquet(shuffled_out)
    )

    # ~30% of the doc_id domain: tight enough to skip, wide enough
    # that a shuffled row group (~12 random ids) almost surely hits.
    lo, hi = 100, 250
    s_touch, s_total = _touched_row_groups(f"{sorted_out}/lang=en/*.parquet", lo, hi)
    r_touch, r_total = _touched_row_groups(f"{shuffled_out}/lang=en/*.parquet", lo, hi)
    assert s_total > 3, "row-group cap did not split the partition"
    assert r_total > 3
    # Sorted: touch ratio tracks range selectivity. Shuffled: every
    # group straddles the range (that's why sorting is the fix).
    assert s_touch / s_total < 0.6
    assert r_touch / r_total > 0.9
    assert s_touch / s_total < 0.7 * (r_touch / r_total)

    # And the adopted read path returns exactly the plain-table result.
    from finmapreduce_spark.queries.textops import (
        _quality_select,
        text_quality_sorted_scan,
    )

    via_sorted = text_quality_sorted_scan(spark, sf_dir)
    plain = _quality_select(
        docs.filter("lang = 'en' AND doc_id >= 100 AND doc_id < 400")
    )
    assert sorted(map(tuple, via_sorted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The z-order layout's two-dimensional win, measured: a ~10%
    range on user_id OR on ts each skips a substantial fraction of the
    z-layout's row groups, while the single-key (user-sorted) layout
    only prunes its own key — a ts range touches essentially all of
    it. Same data, same row-group cap, same footer-stats decision."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.session import read_table
    from finmapreduce_spark.sources.sinks import save_events_zorder

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    rg_bytes = 4 * 1024
    z_out = str(tmp_path / "zorder")
    save_events_zorder(ev, z_out, row_group_bytes=rg_bytes)
    u_out = str(tmp_path / "usersorted")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        (
            ev.repartitionByRange(4, "user_id")
            .sortWithinPartitions("user_id")
            .write.option("parquet.block.size", str(rg_bytes))
            .option("parquet.page.size.row.check.min", "10")
            .option("parquet.page.size.row.check.max", "10")
            .parquet(u_out)
        )
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts"), F.max("ts")
    ).first()
    u_lo, u_hi = stats[0], stats[0] + max(1, (stats[1] - stats[0]) // 10)
    # ts is timestamp_ntz: collected driver datetimes and NTZ parquet
    # stats are both naive; _touched_row_groups normalizes either way
    t_span = stats[3] - stats[2]
    t_lo = stats[2]
    t_hi = t_lo + t_span / 10

    zu_touch, zu_total = _touched_row_groups(f"{z_out}/*.parquet", u_lo, u_hi, "user_id")
    zt_touch, zt_total = _touched_row_groups(f"{z_out}/*.parquet", t_lo, t_hi, "ts")
    uu_touch, uu_total = _touched_row_groups(f"{u_out}/*.parquet", u_lo, u_hi, "user_id")
    ut_touch, ut_total = _touched_row_groups(f"{u_out}/*.parquet", t_lo, t_hi, "ts")
    assert zu_total > 8 and uu_total > 8, "row-group cap did not split files"
    # z-layout prunes BOTH dims (measured at sf0.001/sf0.01:
    # 0.33/0.19 on user_id, 0.25/0.17 on ts)...
    assert zu_touch / zu_total < 0.5
    assert zt_touch / zt_total < 0.5
    # ...a dedicated sort is tighter on its own key (0.08/0.10)...
    assert uu_touch / uu_total < zu_touch / zu_total
    # ...but blind on the other dim (0.77/0.99): the z trade-off.
    assert ut_touch / ut_total > 0.7
    assert ut_touch / ut_total > 2 * (zt_touch / zt_total)
    # and the layout loses no rows
    assert spark.read.parquet(z_out).count() == ev.count()


def test_marker_cli_parse_via_stub_binary(tmp_path, monkeypatch):
    """Drives the real marker subprocess plumbing end-to-end with a
    stub marker_single on PATH (the binary is absent in this image):
    payload lands in a temp pdf, the CLI runs, its markdown comes
    back."""
    import os
    import stat

    from finmapreduce_spark.sources.readers import _marker_parse

    stub = tmp_path / "marker_single"
    stub.write_text(
        "#!/bin/sh\n"
        # args: <pdf> --output_dir <dir>; write <dir>/doc/doc.md
        'mkdir -p "$3/doc"\n'
        'printf "# parsed\\n%s bytes" "$(wc -c < "$1")" > "$3/doc/doc.md"\n'
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}" + os.environ["PATH"])

    out = _marker_parse(b"%PDF-1.4 fake body")
    assert out.startswith("# parsed")
    assert "18 bytes" in out


def test_pdf_parser_auto_falls_back_to_error_row(spark, tmp_path):
    """With no parser installed, parser='auto' must yield parse_error
    rows naming every missed method — the fallback-not-fail posture."""
    from finmapreduce_spark.sources.readers import load_pdf_documents

    d = str(tmp_path / "pdfs")
    import os

    os.makedirs(d)
    with open(os.path.join(d, "a.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 payload")
    rows = load_pdf_documents(spark, d, parser="auto").collect()
    assert len(rows) == 1
    err = rows[0]["parse_error"]
    assert rows[0]["content"] is None
    for name in ("marker", "pypdf", "pdfminer"):
        assert name in err


def test_pdf_parser_unknown_method_is_error_row(spark, tmp_path):
    from finmapreduce_spark.sources.readers import load_pdf_documents

    import os

    d = str(tmp_path / "pdfs")
    os.makedirs(d)
    with open(os.path.join(d, "a.pdf"), "wb") as f:
        f.write(b"%PDF-1.4 x")
    rows = load_pdf_documents(spark, d, parser="nope").collect()
    assert rows[0]["parse_error"] and "unknown parser" in rows[0]["parse_error"]


def test_load_parquet_corpus_schema_drift(spark, tmp_path):
    """Corpus written over time: early files lack later columns.
    mergeSchema unions the vintages (absent columns read as null,
    no rewrite), `expected` adds never-seen columns as typed nulls
    and pins one stable projection order."""
    from finmapreduce_spark.sources.readers import load_parquet_corpus

    out = str(tmp_path / "corpus")
    v1 = spark.createDataFrame(
        [(1, "early doc")], "doc_id long, text string"
    )
    v1.write.parquet(out + "/vintage=2024")
    v2 = spark.createDataFrame(
        [(2, "later doc", "en", 0.9)],
        "doc_id long, text string, lang string, quality double",
    )
    v2.write.parquet(out + "/vintage=2025")

    expected = {
        "doc_id": "long",
        "text": "string",
        "lang": "string",
        "quality": "double",
        "license": "string",  # never seen anywhere yet
    }
    df = load_parquet_corpus(spark, out, expected=expected)
    assert df.columns == list(expected)
    rows = {r["doc_id"]: r.asDict() for r in df.collect()}
    assert rows[1]["lang"] is None and rows[1]["quality"] is None
    assert rows[2]["lang"] == "en" and rows[2]["quality"] == 0.9
    assert all(r["license"] is None for r in rows.values())
    assert dict(df.dtypes)["quality"] == "double"

    # pinned-schema path (no footer merge): same stable projection
    df2 = load_parquet_corpus(
        spark, out, expected=expected, merge_schema=False
    )
    assert df2.columns == list(expected)
    rows2 = {r["doc_id"]: r.asDict() for r in df2.collect()}
    assert rows2[1]["quality"] is None and rows2[2]["quality"] == 0.9


def test_materialize_once_self_heals_markerless_dir(tmp_path):
    """A target directory without a _SUCCESS marker (crashed writer,
    foreign dir) must be replaced, not fail the rename forever."""
    import os

    from finmapreduce_spark.sources.asset_store import materialize_once

    path = str(tmp_path / "store")
    os.makedirs(path)
    with open(os.path.join(path, "junk"), "w") as f:
        f.write("stale")

    def write(tmp):
        os.makedirs(tmp)
        open(os.path.join(tmp, "data"), "w").close()
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    out = materialize_once(path, write)
    assert out == path
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(os.path.join(path, "junk"))
    # idempotent second call: write_fn must NOT run again
    def boom(tmp):
        raise AssertionError("should not rebuild a marked store")

    assert materialize_once(path, boom) == path


def test_asset_store_tag_tracks_source_data(tmp_path):
    """Regenerated testdata must change the cache tag (mtime+size
    fingerprint) so stale /tmp stores self-invalidate."""
    import os
    import shutil
    import time

    from finmapreduce_spark.sources.asset_store import asset_store_path

    sf = str(tmp_path / "sfX")
    os.makedirs(sf)
    src = "/root/testdata/sf0.001/documents.parquet"
    shutil.copy(src, os.path.join(sf, "documents.parquet"))
    tag1 = asset_store_path(sf)
    # same path, regenerated file → different tag
    time.sleep(0.01)
    shutil.copy(src, os.path.join(sf, "documents.parquet"))
    os.utime(os.path.join(sf, "documents.parquet"))
    tag2 = asset_store_path(sf)
    assert tag1 != tag2
