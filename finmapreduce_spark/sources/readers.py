"""Dataset sources (SURVEY §2.1 S1–S10).

Reference parity (/root/reference):
- S1 FinanceBench JSONL  src/loaders/financebench_loader.py:26-52
- S2 FinQA JSON array    src/loaders/finqa_loader.py:27-50
- S3 sample limiting     src/loaders/dataset_loader.py:121-147
- S6 markdown read       src/utils/document_processing.py:344-371
- S8 path catalog        src/utils/document_processing.py:26-100
- S10 upload source      src/loaders/webapp_loader.py:33-61

All loaders project/rename at scan time so Catalyst prunes columns
into the file source, and each returns the fixed stage schema from
``schemas.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw FinanceBench JSONL shape (evidence is a list of objects carrying
# evidence_text; loader flattens it — financebench_loader.py:40-50)
_FINANCEBENCH_RAW = T.StructType(
    [
        T.StructField("financebench_id", T.StringType()),
        T.StructField("doc_name", T.StringType()),
        T.StructField("question", T.StringType()),
        T.StructField("answer", T.StringType()),
        T.StructField("justification", T.StringType()),
        T.StructField(
            "evidence",
            T.ArrayType(
                T.StructType([T.StructField("evidence_text", T.StringType())])
            ),
        ),
        T.StructField("question_type", T.StringType()),
        T.StructField("question_reasoning", T.StringType()),
    ]
)


def load_financebench(
    spark: SparkSession, path: str, num_samples: int | None = None
) -> DataFrame:
    """S1: line-delimited JSON → qa rows; flattens evidence[].evidence_text,
    null-coalesces justification (exact reference default string).

    qa_id assignment is pinned DETERMINISTIC (round-16 advice): the
    scan coalesces to one partition before monotonically_increasing_id
    so ids are 0..n-1 in file order — the reference loader's enumerate
    semantics — and a fetch-failure replay of the downstream
    scan_floor repartition (mapreduce.join_documents) cannot re-draw
    them (the SPARK-38388 duplicate/lost-row class requires a
    nondeterministic upstream; a single-partition file read is not
    one). QA files are small by nature (questions, not corpora); the
    floor re-spreads the DAG right after ids are assigned."""
    df = spark.read.schema(_FINANCEBENCH_RAW).json(path).coalesce(1)
    df = df.select(
        F.monotonically_increasing_id().alias("qa_id"),
        "doc_name",
        "question",
        "answer",
        F.coalesce("justification", F.lit("No justification provided")).alias(
            "justification"
        ),
        F.transform("evidence", lambda e: e.evidence_text).alias("evidence"),
        "question_type",
        "question_reasoning",
    )
    if num_samples is not None:  # S3/W5: take-first-N (reference semantics)
        df = df.limit(num_samples)
    return df


_FINQA_RAW = T.StructType(
    [
        T.StructField("doc_name", T.StringType()),
        T.StructField("question", T.StringType()),
        T.StructField("answer", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("explanation", T.StringType()),
    ]
)


def load_finqa(
    spark: SparkSession, path: str, num_samples: int | None = None
) -> DataFrame:
    """S2: single JSON array (multiLine) with '' defaults for the
    nullable fields (finqa_loader.py:41-48). qa_id is deterministic
    0..n-1 in file order — see load_financebench's pin note (a
    multiLine JSON array is one split already; the coalesce makes the
    guarantee explicit rather than incidental)."""
    df = (
        spark.read.schema(_FINQA_RAW)
        .option("multiLine", True)
        .json(path)
        .coalesce(1)
    )
    df = df.select(
        F.monotonically_increasing_id().alias("qa_id"),
        "doc_name",
        "question",
        "answer",
        F.coalesce("filename", F.lit("")).alias("filename"),
        F.coalesce("explanation", F.lit("")).alias("explanation"),
    )
    if num_samples is not None:
        df = df.limit(num_samples)
    return df


def load_markdown_documents(spark: SparkSession, glob_path: str) -> DataFrame:
    """S6: whole-file markdown corpus → (doc_name, content, source).
    doc_name is the basename without extension (the reference's join
    key convention for FinQA markdowns)."""
    df = spark.read.text(glob_path, wholetext=True).select(
        F.col("value").alias("content"),
        F.input_file_name().alias("source"),
    )
    base = F.element_at(F.split(F.col("source"), "/"), -1)
    return df.select(
        F.regexp_replace(base, r"\.(md|markdown|txt)$", "").alias("doc_name"),
        "content",
        "source",
    )


def build_path_catalog(spark: SparkSession, roots: list[str]) -> DataFrame:
    """S8: doc_name → path dimension table from directory listings.

    The reference resolves paths per-document with os.path probing
    (document_processing.py:26-100); at scale that's a driver-side
    listing once, broadcast everywhere. Extensions tried in the same
    order (.pdf, .md, .markdown, .txt)."""
    rows = []
    exts = (".pdf", ".md", ".markdown", ".txt")
    for root in roots:
        if not os.path.isdir(root):
            continue
        for name in sorted(os.listdir(root)):
            p = os.path.join(root, name)
            stem, ext = os.path.splitext(name)
            if ext.lower() in exts and os.path.isfile(p):
                rows.append((stem, p, ext.lower().lstrip(".")))
    return spark.createDataFrame(
        rows or [("", "", "")], "doc_name string, path string, ext string"
    ).filter(F.col("doc_name") != "")


MAX_UPLOAD_BYTES = 50 * 1024 * 1024  # webapp/backend/config.py:70-90
ALLOWED_UPLOAD_EXTS = (".pdf", ".txt", ".md")


def load_upload(
    spark: SparkSession, path: str, question: str, pdf_parser: str = "auto"
) -> DataFrame:
    """S10+P6: one uploaded file → a 1-row qa DataFrame; extension and
    size validated exactly as the webapp (50 MB, {.pdf,.txt,.md}).

    PDF uploads route through the S4/S5 parser chain (the webapp's
    pdf_parser knob, endpoints.py:192); when no real parser is
    installed the chain falls back to the deterministic printable-text
    extraction so a text-layer PDF still serves (the same fallback the
    batch loader's ``fake`` method uses)."""
    ext = os.path.splitext(path)[1].lower()
    if ext not in ALLOWED_UPLOAD_EXTS:
        raise ValueError(f"unsupported file type {ext!r}")
    if os.path.getsize(path) > MAX_UPLOAD_BYTES:
        raise ValueError("file exceeds 50 MB limit")
    if ext == ".pdf":
        with open(path, "rb") as f:
            payload = f.read()
        if pdf_parser == "fake":
            content = _fake_pdf_parse(payload)
        elif pdf_parser == "auto":
            # only AUTO may degrade to the printable-text extraction —
            # it promised "whatever works"; an explicitly requested
            # parser that is missing must surface, not silently serve
            # garbage for compressed PDFs
            try:
                content = _real_pdf_parse(pdf_parser, payload)
            except NotImplementedError:
                content = _fake_pdf_parse(payload)
        else:
            try:
                content = _real_pdf_parse(pdf_parser, payload)
            except NotImplementedError as e:
                raise ValueError(
                    f"pdf_parser {pdf_parser!r} unavailable: {e}"
                ) from e
    else:
        with open(path, encoding="utf-8", errors="replace") as f:
            content = f.read()
    return spark.createDataFrame(
        [(0, os.path.basename(path), question, content)],
        "qa_id long, doc_name string, question string, content string",
    )


# ---------------------------------------------------------------------------
# S4/S5: PDF binary → parsed text via a pluggable parser UDF
# (reference document_processing.py:194-243 marker CLI, :374-419
# pypdf/pymu/unstructured/pdfminer chain with marker→pdfminer fallback)
# ---------------------------------------------------------------------------

PARSED_DOC_SCHEMA = (
    "doc_name string, content string, source string, parser string, parse_error string"
)


def _fake_pdf_parse(payload: bytes) -> str:
    """Deterministic stand-in parser: decode printable text from the
    byte stream (what a real parser extracts from a text-layer PDF).
    Pure function of the bytes, so tests are hermetic."""
    text = payload.decode("utf-8", errors="ignore")
    return "".join(c for c in text if c.isprintable() or c in "\n\t ")


def _marker_parse(payload: bytes) -> str:
    """marker CLI path (reference document_processing.py:194-243): no
    Python lib needed — shell out to ``marker_single`` when the binary
    is on PATH, read back the markdown it writes. Availability is
    detected per call so each executor checks its own PATH."""
    import shutil
    import subprocess
    import tempfile

    exe = shutil.which("marker_single")
    if exe is None:
        raise NotImplementedError(
            "marker_single CLI not on PATH; install marker-pdf or use "
            "another parser method"
        )
    with tempfile.TemporaryDirectory() as td:
        pdf_path = os.path.join(td, "doc.pdf")
        with open(pdf_path, "wb") as f:
            f.write(payload)
        out_dir = os.path.join(td, "out")
        subprocess.run(
            [exe, pdf_path, "--output_dir", out_dir],
            check=True,
            capture_output=True,
            timeout=600,
        )
        # marker writes <out_dir>/<doc>/<doc>.md
        for root, _dirs, files in os.walk(out_dir):
            for fn in sorted(files):
                if fn.endswith(".md"):
                    with open(os.path.join(root, fn), encoding="utf-8") as f:
                        return f.read()
    raise RuntimeError("marker_single produced no markdown output")


def _pypdf_parse(payload: bytes) -> str:
    import io

    try:
        import pypdf
    except ImportError as e:
        raise NotImplementedError("pypdf not installed") from e
    reader = pypdf.PdfReader(io.BytesIO(payload))
    return "\n".join((page.extract_text() or "") for page in reader.pages)


def _pdfminer_parse(payload: bytes) -> str:
    import io

    try:
        from pdfminer.high_level import extract_text
    except ImportError as e:
        raise NotImplementedError("pdfminer.six not installed") from e
    return extract_text(io.BytesIO(payload))


_PDF_PARSERS = {
    "marker": _marker_parse,
    "pypdf": _pypdf_parse,
    "pdfminer": _pdfminer_parse,
}


def _real_pdf_parse(method: str, payload: bytes) -> str:
    """Real parser registry + fallback chain, availability-gated per
    method (reference document_processing.py:374-419: marker first,
    library extractors as fallback). ``auto`` walks the chain and
    raises NotImplementedError listing every miss only if none of the
    parsers is installed — which in this container becomes a
    parse_error row, never a task failure."""
    if method == "auto":
        misses = []
        for name in ("marker", "pypdf", "pdfminer"):
            try:
                return _PDF_PARSERS[name](payload)
            except NotImplementedError as e:  # lib/CLI absent
                misses.append(f"{name}: {e}")
            except Exception as e:  # noqa: BLE001 — installed parser
                # CHOKED on this file (corrupt PDF, marker timeout):
                # the reference order is marker first, library
                # fallbacks next — a runtime failure moves down the
                # chain exactly like an absent parser does.
                misses.append(f"{name}: {type(e).__name__}: {e}")
        raise NotImplementedError(
            "no PDF parser succeeded — " + "; ".join(misses)
        )
    try:
        fn = _PDF_PARSERS[method]
    except KeyError:
        raise ValueError(
            f"unknown parser {method!r}; one of "
            f"{['fake', 'auto', *_PDF_PARSERS]}"
        ) from None
    return fn(payload)


def load_pdf_documents(
    spark: SparkSession, glob_path: str, parser: str = "fake"
) -> DataFrame:
    """S4/S5: ``binaryFile`` scan → Arrow-batched parse to documents.

    Scale shape: binaryFile splits by file (one task per PDF up to
    maxPartitionBytes); the parser runs executor-side inside
    ``mapInPandas`` so a 100k-PDF corpus parses with full cluster
    parallelism and zero driver involvement. Per-file failures become
    ``parse_error`` rows (the reference's fallback-not-fail posture,
    document_processing.py:404-419), never task failures.
    """
    from collections.abc import Iterator

    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(glob_path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                name = os.path.splitext(os.path.basename(path))[0]
                try:
                    if parser == "fake":
                        text = _fake_pdf_parse(bytes(payload))
                    else:
                        text = _real_pdf_parse(parser, bytes(payload))
                    out.append((name, text, path, parser, None))
                except Exception as e:  # noqa: BLE001 — error-row, not task-fail
                    out.append((name, None, path, parser, str(e)[:500]))
            yield pd.DataFrame(
                out,
                columns=["doc_name", "content", "source", "parser", "parse_error"],
            )

    return raw.mapInPandas(parse, schema=PARSED_DOC_SCHEMA)


def load_parquet_corpus(
    spark: SparkSession,
    path: str,
    expected: dict[str, str] | None = None,
    merge_schema: bool = True,
) -> DataFrame:
    """Corpus reader for parquet written over TIME — the 100 TB shape
    where early partitions predate columns added later (schema drift).

    ``mergeSchema`` makes the scan union all footer schemas (files
    missing a column yield nulls for it — parquet's column-absence
    semantics, no rewrite of old data needed). ``expected`` maps
    column name → Spark type ddl; columns the corpus has NEVER seen
    are added as typed nulls and the projection is reordered to the
    expected order, so downstream plans bind against one stable
    schema regardless of which vintages the glob matched.

    Scale note: mergeSchema reads every file footer up front (a
    driver-side listing + parallel footer fetch). For corpora with
    millions of files, pin the schema instead: pass ``expected`` for
    ALL columns and set merge_schema=False — the scan then trusts the
    declared schema and still null-fills absent columns per file.
    """
    reader = spark.read.option("mergeSchema", str(merge_schema).lower())
    if expected and not merge_schema:
        from pyspark.sql import types as T

        ddl = ", ".join(f"{c} {t}" for c, t in expected.items())
        reader = reader.schema(T._parse_datatype_string(ddl))
    df = reader.parquet(path)
    if expected:
        for col, dtype in expected.items():
            if col not in df.columns:
                df = df.withColumn(col, F.lit(None).cast(dtype))
        df = df.select(*expected.keys())
    return df
