"""Text/document operator surface (SURVEY §2.7 F1–F13 + text-analysis
north-star ops) over the `documents` table.

The chunk → score-filter → ordered-reduce chain here is the exact
data shape of the reference MapReduce DAG (chunking F2 at
document_processing.py:246-267, strict `>` score filter P3 at
hybrid_formatter.py:33-60, order-restoring reduce A1/W1 at
mapreduce_pipeline.py:263-286) with the LLM replaced by the
deterministic mock contract (FIXTURES.md §10) so every stage is
oracle-checkable in ANSI SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finmapreduce_spark.functions.chunking import explode_chunks
from finmapreduce_spark.functions.text import (
    TOKEN_REGEX,
    mock_score_0_10,
    normalize_text,
    token_count,
)
from finmapreduce_spark.functions.truncation import truncate_words
from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.session import read_table

CHUNK_SIZE, CHUNK_OVERLAP = 512, 64  # small config for multi-chunk coverage
_STEP = CHUNK_SIZE - CHUNK_OVERLAP


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# F2: chunking with overlap — pure codegen (sequence + posexplode +
# substring), no Python in the hot path
# ---------------------------------------------------------------------------

def _docs_stripped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with chr(30) (the BPE oracle's token sentinel)
    stripped and NULL text normalized to '' — the same input hygiene
    the DuckDB vtok CTE applies, so tokenizer-exact entries compare
    byte-identically (the synthetic corpus never contains chr(30))."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.replace(
            F.coalesce(F.col("text"), F.lit("")), F.lit("\x1e"), F.lit("")
        ).alias("text"),
    )


# Reference chunk defaults are TOKEN budgets: every real call site
# passes use_tiktoken=True (document_processing.py:358,386,412 →
# RecursiveCharacterTextSplitter.from_tiktoken_encoder cl100k_base),
# so 32768/4096 counts tokens, not characters. Round 15 promotes the
# tokenizer-exact model to the DEFAULT F2 path (VERDICT r14 missing
# #2, ROADMAP "budgets drift" — closed); the char model stays as the
# *_chars twin below behind the token_model="chars"/"words" flag.
REF_CHUNK_SIZE, REF_CHUNK_OVERLAP = 32768, 4096
_REF_STEP = REF_CHUNK_SIZE - REF_CHUNK_OVERLAP


def f2_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, chunk_index, chunk_len): TOKEN-exact
    chunking at the reference defaults (32768/4096 tokens) under the
    engine's default token model (the vendored 4,096-merge BPE via
    the Arrow MergesBPE UDF — functions/token_model.py).

    Scale: narrow map — no shuffle; at 100 TB the chunk explosion
    multiplies rows ~len/step× which is why the score filter (P3)
    must run before any wide op downstream. chunk_len stays the CHAR
    length of the decoded chunk (the downstream contract is text).
    """
    from finmapreduce_spark.functions.exact_tokens import explode_chunks_exact
    from finmapreduce_spark.functions.token_model import (
        default_encoder_factory,
    )

    from finmapreduce_spark.operators.parallelism import scan_floor

    chunks = explode_chunks_exact(
        # guarded scan-parallelism floor: the MergesBPE encode is
        # pure per-doc CPU and a small corpus scans into one split
        scan_floor(_docs_stripped(spark, sf_dir), "doc_id"),
        text_col="text",
        key_cols=("doc_id",),
        chunk_size=REF_CHUNK_SIZE,
        chunk_overlap=REF_CHUNK_OVERLAP,
        encoder_factory=default_encoder_factory("bpe"),
    )
    return chunks.select(
        "doc_id", "chunk_index", F.length("chunk_text").alias("chunk_len")
    )


def _vocab_ctes():
    from finmapreduce_spark.functions.token_model import vocab_tokens_sql_ctes

    return vocab_tokens_sql_ctes()


def _f2_oracle() -> str:
    return f"""
WITH {_vocab_ctes()},
sized AS (SELECT doc_id, tk, len(tk) AS n FROM vtok)
SELECT doc_id, CAST(i AS INT) AS chunk_index,
       length(coalesce(array_to_string(
         list_slice(tk, i * {_REF_STEP} + 1,
                    i * {_REF_STEP} + {REF_CHUNK_SIZE}), ''), '')) AS chunk_len
FROM sized,
     unnest(range(0, CASE WHEN n <= {REF_CHUNK_SIZE} THEN 1
                          ELSE CAST(ceil((n - {REF_CHUNK_SIZE})
                                    / {_REF_STEP}.0) AS BIGINT) + 1 END))
       AS t(i)
"""


def f2_chunk_documents_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rounds-1..14 character-window F2 (CharacterTextSplitter
    semantics — the reference's non-tiktoken mode), kept behind the
    legacy flag: pure codegen, no Python, closed-form boundaries."""
    chunks = explode_chunks(
        _docs(spark, sf_dir),
        text_col="text",
        key_cols=("doc_id",),
        chunk_size=CHUNK_SIZE,
        chunk_overlap=CHUNK_OVERLAP,
    )
    return chunks.select("doc_id", "chunk_index", F.length("chunk_text").alias("chunk_len"))


F2_CHARS_ORACLE = f"""
SELECT doc_id, CAST(i AS INT) AS chunk_index,
       length(substring(text, CAST(i AS INT) * {_STEP} + 1, {CHUNK_SIZE})) AS chunk_len
FROM (
  SELECT doc_id, text,
         CASE WHEN length(text) <= {CHUNK_SIZE} THEN 1
              ELSE CAST(ceil((length(text) - {CHUNK_SIZE}) / {_STEP}.0) AS BIGINT) + 1
         END AS n_chunks
  FROM documents
), LATERAL unnest(range(0, n_chunks)) AS t(i)
"""


# ---------------------------------------------------------------------------
# F3/F4: token-budget truncation (closed-form word slice; reference
# binary-searches because its token model is BPE — truncation_utils.py:35-120)
# ---------------------------------------------------------------------------

TRUNC_BUDGET = 100


def _truncation_exact(spark, sf_dir, strategy):
    """F3/F4 under the DEFAULT token model (round 15): the budget
    counts vendored-BPE tokens, matching the reference's
    tiktoken-token budgets (truncation_utils.py binary-searches over
    cl100k tokens; here: encode once, slice, decode)."""
    from finmapreduce_spark.functions.exact_tokens import truncate_words_exact
    from finmapreduce_spark.functions.token_model import (
        default_encoder_factory,
    )

    docs = _docs_stripped(spark, sf_dir)
    out = truncate_words_exact(
        docs,
        "text",
        TRUNC_BUDGET,
        strategy=strategy,
        encoder_factory=default_encoder_factory("bpe"),
    )
    return out.select(
        "doc_id",
        F.md5("trunc_text").alias("trunc_md5"),  # compact but exact content check
        "trunc_tokens",
        "trunc_original",
        "trunc_applied",
        F.round("trunc_retention", 6).alias("trunc_retention"),
    )


def f3_truncate_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _truncation_exact(spark, sf_dir, "start")


def f4_truncate_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _truncation_exact(spark, sf_dir, "end")


def _truncation_words(spark, sf_dir, strategy):
    """The rounds-1..14 closed-form word-budget truncation, kept
    behind the legacy token_model="words" flag (zero-Python path)."""
    docs = _docs(spark, sf_dir)
    out = truncate_words(docs, "text", TRUNC_BUDGET, strategy=strategy)
    return out.select(
        "doc_id",
        F.md5("trunc_text").alias("trunc_md5"),
        "trunc_tokens",
        "trunc_original",
        "trunc_applied",
        F.round("trunc_retention", 6).alias("trunc_retention"),
    )


def f3_truncate_start_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _truncation_words(spark, sf_dir, "start")


def f4_truncate_end_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _truncation_words(spark, sf_dir, "end")


def _trunc_exact_oracle(end: bool) -> str:
    slice_expr = (
        f"list_slice(tk, greatest(1, n - {TRUNC_BUDGET} + 1), n)"
        if end
        else f"list_slice(tk, 1, {TRUNC_BUDGET})"
    )
    return f"""
WITH {_vocab_ctes()},
sized AS (SELECT doc_id, tk, len(tk) AS n FROM vtok)
SELECT doc_id,
       md5(coalesce(array_to_string({slice_expr}, ''), '')) AS trunc_md5,
       CAST(least(n, {TRUNC_BUDGET}) AS BIGINT) AS trunc_tokens,
       CAST(n AS BIGINT) AS trunc_original,
       n > {TRUNC_BUDGET} AS trunc_applied,
       round(CASE WHEN n > 0 THEN least(n, {TRUNC_BUDGET}) * 1.0 / n
                  ELSE 1.0 END, 6) AS trunc_retention
FROM sized
"""


_TRUNC_COMMON = f"""
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents
"""

F3_WORDS_ORACLE = f"""
SELECT doc_id,
       md5(array_to_string(list_slice(words, 1, {TRUNC_BUDGET}), ' ')) AS trunc_md5,
       CASE WHEN n IS NOT NULL
            THEN CAST(least(n, {TRUNC_BUDGET}) AS BIGINT) END AS trunc_tokens,
       CAST(n AS BIGINT) AS trunc_original,
       n > {TRUNC_BUDGET} AS trunc_applied,
       round(CASE WHEN n > 0 THEN least(n, {TRUNC_BUDGET}) / n
                  WHEN n = 0 THEN 1.0 END, 6) AS trunc_retention
FROM ({_TRUNC_COMMON})
"""

F4_WORDS_ORACLE = f"""
SELECT doc_id,
       md5(array_to_string(list_slice(words, greatest(1, n - {TRUNC_BUDGET} + 1), n), ' ')) AS trunc_md5,
       CASE WHEN n IS NOT NULL
            THEN CAST(least(n, {TRUNC_BUDGET}) AS BIGINT) END AS trunc_tokens,
       CAST(n AS BIGINT) AS trunc_original,
       n > {TRUNC_BUDGET} AS trunc_applied,
       round(CASE WHEN n > 0 THEN least(n, {TRUNC_BUDGET}) / n
                  WHEN n = 0 THEN 1.0 END, 6) AS trunc_retention
FROM ({_TRUNC_COMMON})
"""


# ---------------------------------------------------------------------------
# P3+F8: strict `>` score filter over mock map content (reference
# hybrid_formatter.py:33-60; threshold default 5, strict — a score of
# exactly 5 is dropped, and malformed content without 'Score:' is dropped)
# ---------------------------------------------------------------------------

SCORE_THRESHOLD = 5


def p3_score_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → mock 'Score: N' content (absent when N==0, the malformed
    case) → regexp extract → strict > threshold."""
    chunks = explode_chunks(
        _docs(spark, sf_dir),
        text_col="text",
        key_cols=("doc_id",),
        chunk_size=CHUNK_SIZE,
        chunk_overlap=CHUNK_OVERLAP,
    )
    score = mock_score_0_10(F.col("chunk_text"))
    content = F.when(score == 0, F.lit("model returned no score")).otherwise(
        F.concat(F.lit("Analysis complete. Score: "), score.cast("string"))
    )
    extracted = F.regexp_extract(content, r"Score:\s*(\d+)", 1)
    extracted = F.when(extracted == "", None).otherwise(extracted.cast("int"))
    return (
        chunks.withColumn("content", content)
        .withColumn("score", extracted)
        .filter(F.col("score") > SCORE_THRESHOLD)
        .select("doc_id", "chunk_index", "score")
    )


P3_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_index,
         substring(text, CAST(i AS INT) * {_STEP} + 1, {CHUNK_SIZE}) AS chunk_text
  FROM (
    SELECT doc_id, text,
           CASE WHEN length(text) <= {CHUNK_SIZE} THEN 1
                ELSE CAST(ceil((length(text) - {CHUNK_SIZE}) / {_STEP}.0) AS BIGINT) + 1
           END AS n_chunks
    FROM documents
  ), LATERAL unnest(range(0, n_chunks)) AS t(i)
), scored AS (
  SELECT doc_id, chunk_index,
         CAST((strpos('0123456789abcdef', substring(md5(chunk_text), 1, 1)) - 1) % 11 AS INT) AS mock
  FROM chunks
), content AS (
  SELECT doc_id, chunk_index,
         CASE WHEN mock = 0 THEN 'model returned no score'
              ELSE 'Analysis complete. Score: ' || CAST(mock AS VARCHAR) END AS content
  FROM scored
)
SELECT doc_id, chunk_index,
       CAST(regexp_extract(content, 'Score:\\s*(\\d+)', 1) AS INT) AS score
FROM content
WHERE regexp_extract(content, 'Score:\\s*(\\d+)', 1) <> ''
  AND CAST(regexp_extract(content, 'Score:\\s*(\\d+)', 1) AS INT) > {SCORE_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# A1+W1: ordered reduce — gather kept chunks per doc in chunk order and
# serialize (reference mapreduce_pipeline.py:263-286: sort by chunk idx
# then join; order is semantic, not incidental)
# ---------------------------------------------------------------------------

def a1_reduce_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(doc).agg(sort_array(collect_list(struct(idx, text)))) →
    ordered serialization. The classic partial+final agg: collect_list
    partials run map-side; memory is bounded because the score filter
    pruned low-relevance chunks first (SURVEY §7 M5 note).
    """
    chunks = explode_chunks(
        _docs(spark, sf_dir),
        text_col="text",
        key_cols=("doc_id",),
        chunk_size=CHUNK_SIZE,
        chunk_overlap=CHUNK_OVERLAP,
    )
    kept = chunks.filter(mock_score_0_10(F.col("chunk_text")) > SCORE_THRESHOLD)
    gathered = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            "\n",  # reference joins with a single newline
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_index", "chunk_text"))
                ),
                lambda s: s.chunk_text,
            ),
        ).alias("reduced"),
    )
    return gathered.select("doc_id", "n_kept", F.md5("reduced").alias("reduced_md5"))


A1_ORACLE = f"""
WITH chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_index,
         substring(text, CAST(i AS INT) * {_STEP} + 1, {CHUNK_SIZE}) AS chunk_text
  FROM (
    SELECT doc_id, text,
           CASE WHEN length(text) <= {CHUNK_SIZE} THEN 1
                ELSE CAST(ceil((length(text) - {CHUNK_SIZE}) / {_STEP}.0) AS BIGINT) + 1
           END AS n_chunks
    FROM documents
  ), LATERAL unnest(range(0, n_chunks)) AS t(i)
), kept AS (
  SELECT * FROM chunks
  WHERE (strpos('0123456789abcdef', substring(md5(chunk_text), 1, 1)) - 1) % 11 > {SCORE_THRESHOLD}
)
SELECT doc_id, count(*) AS n_kept,
       md5(string_agg(chunk_text, chr(10) ORDER BY chunk_index)) AS reduced_md5
FROM kept GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# F11: text normalization (reference augment_finqa.py:24-31)
# ---------------------------------------------------------------------------

def f11_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("norm_md5")
    )


F11_ORACLE = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[,\.\(\)\$%]', '', 'g'),
                               '\s+', ' ', 'g'))) AS norm_md5
FROM documents
"""


# F12: number extraction (years/amounts; reference augment_finqa.py:34-60)
# documents carry no digits, so extract from a constructed financial
# sentence per order — integer-only stringification (cross-engine safe).

def f12_extract_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    sent = F.concat(
        F.lit("Order totaled $"),
        # floor(), not cast: Spark casts double→bigint by truncation
        # while DuckDB rounds — floor is identical in both engines
        F.floor("o_totalprice").cast("string"),
        F.lit(" in "),
        F.year("o_orderdate").cast("string"),
        F.lit(" for customer "),
        F.col("o_custkey").cast("string"),
    )
    nums = F.regexp_extract_all(sent, F.lit(r"[0-9]+"), F.lit(0))
    return orders.select(
        "o_orderkey",
        F.array_join(nums, ",").alias("numbers"),
        F.size(nums).alias("n_numbers"),
    )


F12_ORACLE = """
SELECT o_orderkey,
       array_to_string(regexp_extract_all(sent, '[0-9]+'), ',') AS numbers,
       CAST(len(regexp_extract_all(sent, '[0-9]+')) AS INT) AS n_numbers
FROM (
  SELECT o_orderkey,
         'Order totaled $' || CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR)
         || ' in ' || CAST(year(o_orderdate) AS VARCHAR)
         || ' for customer ' || CAST(o_custkey AS VARCHAR) AS sent
  FROM orders WHERE o_orderkey < 2000
)
"""


# ---------------------------------------------------------------------------
# Text analysis north-star ops (task brief: token counting, quality
# scoring, fingerprinting, language-ID)
# ---------------------------------------------------------------------------

def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 with the round-15 default promoted: n_tokens is the EXACT
    count under the engine's default token model (vendored-BPE Arrow
    UDF — the reference counts tiktoken tokens, never words:
    document_processing.py:19-23), with the legacy whitespace and
    BPE-ish-regex approximations kept alongside for comparison."""
    from finmapreduce_spark.functions.token_model import (
        default_encoder_factory,
    )

    factory = default_encoder_factory("bpe")

    @F.pandas_udf("long")
    def _n_exact(texts: pd.Series) -> pd.Series:
        enc = factory()
        return texts.fillna("").map(
            lambda s: len(enc.encode(s.replace("\x1e", "")))
        )

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        _n_exact(F.col("text")).alias("n_tokens"),
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )


def _token_count_oracle() -> str:
    return f"""
WITH {_vocab_ctes()}
SELECT d.doc_id,
       CAST(len(v.tk) AS BIGINT) AS n_tokens,
       CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(d.text, '{TOKEN_REGEX}')) AS BIGINT) AS bpe_tokens
FROM documents d JOIN vtok v ON v.doc_id = d.doc_id
"""


STOPWORDS = ("the", "a", "of", "and", "to")


def _quality_select(docs: DataFrame) -> DataFrame:
    """Quality-heuristic projection shared by the plain and
    sorted-layout scans. The word split is materialized once — the
    inline expression was re-evaluated by each of its three consumers
    (size, array_distinct, the stopword filter) per row."""
    docs = docs.withColumn("__words", F.split(F.trim(F.col("text")), r"\s+"))
    words = F.col("__words")
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(0.0)
    uniq_ratio = F.when(n > 0, n_distinct / n).otherwise(0.0)
    quality = (
        F.when(n >= 50, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((stop_ratio > 0.02) & (stop_ratio < 0.5), F.lit(0.3)).otherwise(0.0)
        + uniq_ratio * 0.3
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / uniqueness quality heuristic — the
    pre-training-data quality gate pattern."""
    return _quality_select(_docs(spark, sf_dir))


# 16-bit integrity hash of the TEXT column (the doc_id twin lives in
# _hash_bucket_expr); summed per group it catches any row lost,
# duplicated, or corrupted by a format round-trip
def _text_hash16(col):
    h = F.md5(col)
    # one conv decodes the 4-digit window — identical value to the
    # oracle's digit-by-digit strpos arithmetic (same base-16
    # expansion), one md5 subtree instead of four
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


_TEXT_HASH16_SQL = (
    "(((strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1"
)

_FORMAT_SCAN_ORACLE = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum({_TEXT_HASH16_SQL}) AS BIGINT) AS text_hash_sum
FROM documents WHERE lang IN ('en', 'de')
GROUP BY lang
"""


def _format_scan_agg(back) -> DataFrame:
    return (
        back.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(_text_hash16(F.col("text"))).cast("long").alias(
                "text_hash_sum"
            ),
        )
    )


def documents_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus integrity through the ORC layout (format breadth): a
    ``save_corpus_orc`` copy read back with a lang predicate and
    summarized with a per-row text hash — any row the ORC round-trip
    loses, duplicates, or corrupts hash-mismatches the plain-parquet
    oracle. The lang predicate prunes partition directories exactly
    as in the sorted-parquet layout."""
    import hashlib
    import os
    import tempfile

    from finmapreduce_spark.sources.sinks import save_corpus_orc

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"fmr_orc_corpus_{tag}")
    save_corpus_orc(docs, path)
    return _format_scan_agg(spark.read.orc(path))


def documents_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus integrity through the CSV interchange export — the
    round-trip that actually breaks in the wild (embedded quotes,
    delimiters, newlines, unicode). The writer fully quotes/escapes
    and the reader is multiLine with the same conventions; the
    adversarial-corpus sweep drives poison text through this path,
    so a quoting bug is a hash mismatch, not a silent corruption."""
    import hashlib
    import os
    import tempfile

    from finmapreduce_spark.sources.sinks import read_corpus_csv, save_corpus_csv

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "n_chars")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"fmr_csv_corpus_{tag}")
    save_corpus_csv(docs, path)
    back = read_corpus_csv(
        spark, path, "doc_id long, text string, lang string, n_chars long"
    )
    return _format_scan_agg(back)


def text_quality_sorted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same quality gate routed through the production corpus
    layout: a ``save_corpus_sorted`` copy (lang partition dirs,
    doc_id-sorted row groups), read back with a lang + doc_id-range
    predicate.

    Scale: the lang predicate prunes whole partition DIRECTORIES
    (never opened), and the doc_id range skips row groups on footer
    min/max alone — at 100 TB the scan touches ~range-selectivity of
    one partition instead of the corpus. The measured sorted-vs-
    shuffled touch ratio is pinned in tests/test_sources.py; this
    catalog entry pins end-to-end correctness of the adopted path
    against the unsorted original (the oracle reads the plain table).
    """
    import hashlib
    import os
    import tempfile

    from finmapreduce_spark.sources.sinks import save_corpus_sorted

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"fmr_sorted_corpus_{tag}")
    save_corpus_sorted(docs, path, row_group_bytes=256 * 1024)
    back = spark.read.parquet(path).filter(
        (F.col("lang") == "en")
        & (F.col("doc_id") >= 100)
        & (F.col("doc_id") < 400)
    )
    return _quality_select(back)


QUALITY_ORACLE = f"""
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       round(stop_ratio, 6) AS stop_ratio,
       round(uniq_ratio, 6) AS uniq_ratio,
       round(CASE WHEN n >= 50 THEN 0.4 ELSE 0.0 END
             + CASE WHEN stop_ratio > 0.02 AND stop_ratio < 0.5 THEN 0.3 ELSE 0.0 END
             + uniq_ratio * 0.3, 6) AS quality
FROM (
  SELECT doc_id, n,
         CASE WHEN n > 0 THEN n_stop / n ELSE 0.0 END AS stop_ratio,
         CASE WHEN n > 0 THEN n_distinct / n ELSE 0.0 END AS uniq_ratio
  FROM (
    SELECT doc_id,
           len(words) AS n,
           len(list_distinct(words)) AS n_distinct,
           len(list_filter(words, w -> w IN {STOPWORDS!r})) AS n_stop
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents)
  )
)
"""

def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition metrics, adapted to this
    corpus's single-line word streams: per document, the fraction of
    word bigrams covered by the MOST COMMON bigram (top_bigram_frac)
    and the fraction of bigram occurrences that are duplicates of an
    earlier one (dup_bigram_frac). High values flag boilerplate /
    degenerate-generation documents before pretraining.

    Scale: bigrams are built JVM-side (sequence + transform + slice —
    no Python), then ONE shuffle on (doc_id, bigram) counts them and
    one map-side-combined shuffle on doc_id folds counts into the two
    fractions. Shuffle volume is O(distinct bigrams), not O(words);
    both aggs partial-aggregate. The per-doc group is bounded by doc
    length, so no key can outgrow an executor.
    """
    docs = _docs(spark, sf_dir)
    # Materialize the word split before the bigram lambda references
    # it — an inline split inside a higher-order-function lambda is
    # re-evaluated PER ELEMENT (the _shingles_of O(n²) trap,
    # dedup.py:62): every bigram re-split the whole document.
    docs = docs.withColumn("__words", F.split(F.trim(F.col("text")), r"\s+"))
    words = F.col("__words")
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty —
    # guard single-word docs explicitly (DuckDB's generate_series(1,0)
    # is empty, so both engines then agree: no bigrams, no row).
    grams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select(
        "doc_id", F.explode(grams).alias("bigram")
    )
    counts = exploded.groupBy("doc_id", "bigram").agg(
        F.count("*").alias("cnt")
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.col("cnt") - 1).alias("dup_cnt"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.round(F.col("top_cnt") / F.col("n_bigrams"), 6).alias(
                "top_bigram_frac"
            ),
            F.round(F.col("dup_cnt") / F.col("n_bigrams"), 6).alias(
                "dup_bigram_frac"
            ),
        )
    )


REPETITION_ORACLE = """
WITH grams AS (
  SELECT doc_id,
         words[i] || ' ' || words[i + 1] AS bigram
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents),
       LATERAL unnest(generate_series(1, len(words) - 1)) AS t(i)
),
counts AS (
  SELECT doc_id, bigram, count(*) AS cnt FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       round(max(cnt) / sum(cnt), 6) AS top_bigram_frac,
       round(sum(cnt - 1) / sum(cnt), 6) AS dup_bigram_frac
FROM counts GROUP BY 1
"""


# Same computation restricted to the sorted-scan predicate; the oracle
# reads the PLAIN table, so a hash match proves the sorted layout
# round-trips values exactly.
QUALITY_SORTED_ORACLE = QUALITY_ORACLE.replace(
    "AS words FROM documents)",
    "AS words FROM documents"
    " WHERE lang = 'en' AND doc_id >= 100 AND doc_id < 400)",
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    order-insensitive near-dup key (bag-of-words collision class)."""
    docs = _docs(spark, sf_dir)
    tokens = F.array_sort(F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+")))
    return docs.select(
        "doc_id", F.md5(F.array_join(tokens, " ")).alias("fingerprint")
    )


FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(trim(lower(text)), '\\s+'))), ' ')) AS fingerprint
FROM documents
"""


# Language-ID: fixed function-word profiles scored against the doc's
# token set; argmax with deterministic tiebreak. (The synthetic corpus
# shares one vocabulary across langs, so predictions exercise the
# plumbing, not linguistics — the real-corpus version swaps profiles.)

LANG_PROFILES = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialized once — the profile scorer references the token set
    # once per language (5 re-splits per row with the inline form)
    docs = _docs(spark, sf_dir).withColumn(
        "__toks", F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
    )
    tokens = F.col("__toks")
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.size(F.array_intersect(tokens, F.array(*[F.lit(w) for w in prof]))).alias(
                f"score_{l}"
            )
            for l, prof in sorted(LANG_PROFILES.items())
        ],
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{l}") == best, F.lit(l)) for l in langs]
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        pred.alias("pred_lang"),
        best.alias("best_score"),
    )


_LANG_SCORE_SQL = ", ".join(
    f"len(list_intersect(tokens, {list(prof)!r})) AS score_{l}"
    for l, prof in sorted(LANG_PROFILES.items())
)
_LANG_BEST = "greatest(" + ", ".join(f"score_{l}" for l in sorted(LANG_PROFILES)) + ")"
_LANG_PRED = "coalesce(" + ", ".join(
    f"CASE WHEN score_{l} = {_LANG_BEST} THEN '{l}' END" for l in sorted(LANG_PROFILES)
) + ")"

LANGID_ORACLE = f"""
SELECT doc_id, lang AS true_lang,
       {_LANG_PRED} AS pred_lang,
       CAST({_LANG_BEST} AS INT) AS best_score
FROM (
  SELECT doc_id, lang, {_LANG_SCORE_SQL}
  FROM (SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tokens
        FROM documents)
)
"""


# F9: XML escape + chunk render (reference json_formatter.py:55-98)

def f9_xml_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    from finmapreduce_spark.functions.render import render_chunk_xml

    docs = _docs(spark, sf_dir)
    # inject XML specials so the escape chain is actually exercised
    spiced = F.concat(
        F.substring("text", 1, 40), F.lit(""" & <tag attr="v"> 'q' </tag>""")
    )
    return docs.select(
        "doc_id",
        render_chunk_xml(F.col("doc_id").cast("int"), spiced).alias("chunk_xml"),
    )


def _f9_oracle() -> str:
    from finmapreduce_spark.functions.render import xml_escape_sql

    esc = xml_escape_sql(
        """substring(text, 1, 40) || ' & <tag attr="v"> ''q'' </tag>'"""
    )
    return f"""
SELECT doc_id,
       '<chunk_' || CAST(doc_id AS VARCHAR) || '>' || chr(10)
       || {esc}
       || chr(10) || '</chunk_' || CAST(doc_id AS VARCHAR) || '>' AS chunk_xml
FROM documents
"""


# ---------------------------------------------------------------------------
# PII redaction: scrub email / phone / SSN-shaped spans before a corpus
# ships to training. Pure regexp_replace chain — codegen'd, no UDF, no
# shuffle; the redaction count comes from measuring length deltas, so
# the text is scanned once per pattern.
# ---------------------------------------------------------------------------

_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}[-.\s]\d{3}[-.\s]\d{4}", "<PHONE>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
]


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact PII-shaped spans; emit the scrubbed text hash + per-class
    hit counts (ordering matters: SSN runs after phone so a phone-
    shaped SSN match is consistent across engines)."""
    docs = _docs(spark, sf_dir)
    out = docs.select("doc_id", F.col("text").alias("t"))
    counts = []
    for name, pat, tag in _PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0)))
        ).withColumn("t", F.regexp_replace("t", pat, tag))
        counts.append(f"n_{name}")
    return out.select("doc_id", F.md5("t").alias("redacted_hash"), *counts)


_PII_SQL_STEPS = "regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'), '{p}', '<PHONE>', 'g'), '{s}', '<SSN>', 'g')".format(
    e=_PII_PATTERNS[0][1], p=_PII_PATTERNS[1][1], s=_PII_PATTERNS[2][1]
)

PII_ORACLE = f"""
SELECT doc_id,
       md5({_PII_SQL_STEPS}) AS redacted_hash,
       len(regexp_extract_all(text, '{_PII_PATTERNS[0][1]}')) AS n_email,
       len(regexp_extract_all(regexp_replace(text, '{_PII_PATTERNS[0][1]}', '<EMAIL>', 'g'), '{_PII_PATTERNS[1][1]}')) AS n_phone,
       len(regexp_extract_all(regexp_replace(regexp_replace(text, '{_PII_PATTERNS[0][1]}', '<EMAIL>', 'g'), '{_PII_PATTERNS[1][1]}', '<PHONE>', 'g'), '{_PII_PATTERNS[2][1]}')) AS n_ssn
FROM documents
"""


# ---------------------------------------------------------------------------
# Corpus token frequency top-k: the wordcount that sizes a tokenizer
# vocabulary. explode → two-level agg (map-side combine on (token)
# collapses each partition before the shuffle) → global top-k.
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 50


def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counted = toks.groupBy("token").agg(F.count("*").alias("n"))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-K, K-row driver merge) so the only unpartitioned window runs
    # over exactly K rows — never the full |vocab| table. Same shape as
    # vocab_head_coverage (training.py).
    top = counted.orderBy(F.desc("n"), F.asc("token")).limit(VOCAB_TOP_K)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("n"), F.asc("token"))),
    )
    return ranked.select(F.col("rank").cast("int").alias("rank"), "token", "n")


TOKEN_TOPK_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
counted AS (
  SELECT token, count(*) AS n FROM toks WHERE token <> '' GROUP BY token
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n DESC, token) AS rank FROM counted
)
SELECT CAST(rank AS INT) AS rank, token, n FROM ranked WHERE rank <= {VOCAB_TOP_K}
"""




# ---------------------------------------------------------------------------
# Deterministic train/val/test split: hash-bucket the STABLE key, not
# rand() — reshuffling the data or adding rows never reassigns an
# existing doc's split, which is what makes the split reproducible
# across runs/engines and safe for dedup-then-split pipelines.
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _hash_bucket_expr(col):
    """First 4 hex chars of md5(key) as an int in [0, 65536) — the
    same arithmetic the oracle does, digit by digit."""
    h = F.md5(col.cast("string"))
    # one conv (see _text_hash16) — same value, digit-for-digit
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucket = _hash_bucket_expr(F.col("doc_id")) % 100
    assigned = docs.select(
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split")
    )
    return assigned.groupBy("split").agg(F.count("*").alias("n"))


SPLIT_SQL_BUCKET = (
    "(((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1"
)

SPLIT_ORACLE = f"""
SELECT CASE WHEN ({SPLIT_SQL_BUCKET}) % 100 < 80 THEN 'train'
            WHEN ({SPLIT_SQL_BUCKET}) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Corpus data-profile: the per-column quality report that gates a
# training ingest (row counts, null rates, distinct cardinality,
# length stats) — one aggregation pass, unioned per column.
# ---------------------------------------------------------------------------

def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)

    def prof(col, is_text):
        return docs.agg(
            F.lit(col).alias("column"),
            F.count("*").alias("n_rows"),
            F.count_if(F.col(col).isNull()).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            (
                F.round(F.avg(F.length(col)), 6)
                if is_text
                else F.lit(None).cast("double")
            ).alias("avg_len"),
        )

    return (
        prof("text", True)
        .unionByName(prof("lang", True))
        .unionByName(prof("source", True))
        .unionByName(prof("n_chars", False))
    )


PROFILE_ORACLE = """
SELECT 'text' AS "column", count(*) AS n_rows,
       count(*) FILTER (text IS NULL) AS n_null,
       count(DISTINCT text) AS n_distinct,
       round(avg(length(text)), 6) AS avg_len
FROM documents
UNION ALL
SELECT 'lang', count(*), count(*) FILTER (lang IS NULL),
       count(DISTINCT lang), round(avg(length(lang)), 6) FROM documents
UNION ALL
SELECT 'source', count(*), count(*) FILTER (source IS NULL),
       count(DISTINCT source), round(avg(length(source)), 6) FROM documents
UNION ALL
SELECT 'n_chars', count(*), count(*) FILTER (n_chars IS NULL),
       count(DISTINCT n_chars), NULL FROM documents
"""




# ---------------------------------------------------------------------------
# CDC merge (upsert): open-source Spark has no MERGE INTO without a
# table format (Delta/Iceberg), so the portable pattern is a keyed
# full-outer join + coalesce — new keys insert, matched keys take the
# update, unmatched base rows persist. The updates table here is
# synthesized (every 10th doc re-texted + 5 fresh ids) so the oracle
# can rebuild the identical merge in SQL.
# ---------------------------------------------------------------------------

N_MERGE_INSERTS = 5


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs(spark, sf_dir).select("doc_id", "text")
    updates = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.concat(F.lit("updated: "), "text").alias("text"))
        .unionByName(
            spark.range(N_MERGE_INSERTS).select(
                (F.lit(5_000_000) + F.col("id")).alias("doc_id"),
                F.concat(F.lit("inserted doc "), F.col("id").cast("string")).alias(
                    "text"
                ),
            )
        )
    )
    # Row EXISTENCE flags, not text-nullness, drive the action: a doc
    # that exists in base with NULL text (failed parse) is keep/update,
    # not a phantom insert — matching the oracle's b.doc_id IS NULL
    # test (divergence caught by the adversarial parity sweep).
    merged = (
        base.select(
            "doc_id",
            F.col("text").alias("base_text"),
            F.lit(True).alias("in_base"),
        )
        .join(
            updates.select(
                "doc_id",
                F.col("text").alias("upd_text"),
                F.lit(True).alias("in_upd"),
            ),
            "doc_id",
            "full_outer",
        )
        .select(
            "doc_id",
            F.coalesce("upd_text", "base_text").alias("text"),
            F.when(F.col("in_base").isNull(), "insert")
            .when(F.col("in_upd").isNull(), "keep")
            .otherwise("update")
            .alias("action"),
        )
    )
    # coalesce the text hash: Spark's concat_ws SKIPS a NULL md5 while
    # DuckDB's || PROPAGATES it — pin both to an explicit marker
    return merged.groupBy("action").agg(
        F.count("*").alias("n"),
        F.md5(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(
                            ":",
                            F.col("doc_id"),
                            F.coalesce(F.md5("text"), F.lit("NULL")),
                        )
                    )
                ),
            )
        ).alias("content_fingerprint"),
    )


MERGE_ORACLE = f"""
WITH base AS (SELECT doc_id, text FROM documents),
updates AS (
  SELECT doc_id, 'updated: ' || text AS text FROM base WHERE doc_id % 10 = 0
  UNION ALL
  SELECT 5000000 + t.i, 'inserted doc ' || CAST(t.i AS VARCHAR)
  FROM range(0, {N_MERGE_INSERTS}) t(i)
),
merged AS (
  SELECT coalesce(b.doc_id, u.doc_id) AS doc_id,
         coalesce(u.text, b.text) AS text,
         CASE WHEN b.doc_id IS NULL THEN 'insert'
              WHEN u.doc_id IS NULL THEN 'keep'
              ELSE 'update' END AS action
  FROM base b FULL OUTER JOIN updates u USING (doc_id)
)
SELECT action, count(*) AS n,
       md5(array_to_string(
             list_sort(list(CAST(doc_id AS VARCHAR) || ':'
                            || coalesce(md5(text), 'NULL'))), '|'
           )) AS content_fingerprint
FROM merged GROUP BY action
"""




# ---------------------------------------------------------------------------
# Stratified sampling: N docs per class (lang), ordered by the SAME
# deterministic hash bucket as the split — class balancing that is
# stable across runs and engines (no rand(), no sampleBy seed drift).
# ---------------------------------------------------------------------------

STRATUM_N = 40


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", _hash_bucket_expr(F.col("doc_id")).alias("hb")
    )
    ranked = docs.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.asc("hb"), F.asc("doc_id"))
        ),
    )
    return ranked.filter(F.col("rk") <= STRATUM_N).select(
        "lang", F.col("rk").cast("int").alias("rk"), "doc_id"
    )


SAMPLE_STRAT_ORACLE = f"""
WITH hb AS (
  SELECT doc_id, lang, {SPLIT_SQL_BUCKET} AS hb FROM documents
),
ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY hb, doc_id) AS rk
  FROM hb
)
SELECT lang, CAST(rk AS INT) AS rk, doc_id FROM ranked WHERE rk <= {STRATUM_N}
"""


# ---------------------------------------------------------------------------
# Weighted sampling without RNG: Efraimidis–Spirakis exponential keys
# over hash-derived uniforms. key = ln(u)/w with u = hash-uniform and
# w = doc length; the top-k keys ARE a weight-proportional sample
# without replacement — deterministic, reproducible across engines and
# re-runs (no seed state to lose).
# ---------------------------------------------------------------------------

SAMPLE_WEIGHTED_K = 20


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} weight-proportional sample of documents (weight =
    n_chars, so long docs are proportionally likelier — the standard
    token-budget-aware corpus draw).

    Scale: one narrow map computes the key, then a global top-k —
    Spark plans orderBy+limit as TakeOrdered (per-partition heap +
    driver merge of k×partitions rows), never a full sort. Keys round
    to 9 dp with doc_id tiebreak so ln() ulp differences between libm
    implementations cannot reorder the boundary.
    """
    # weight must be POSITIVE: a zero-length doc has zero sampling
    # probability by definition, and under ANSI mode ln(u)/0 throws
    # DIVIDE_BY_ZERO instead of producing the -inf key — filter
    # before the division in both engines (total semantics on real
    # corpora with empty/failed-parse rows)
    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    u = (_hash_bucket_expr(F.col("doc_id")) + 1) / F.lit(65537.0)
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(SAMPLE_WEIGHTED_K)
    )


SAMPLE_WEIGHTED_ORACLE = f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       round(ln(({SPLIT_SQL_BUCKET} + 1) / 65537.0) / n_chars, 9) AS es_key
FROM documents
WHERE n_chars > 0
ORDER BY es_key DESC, doc_id
LIMIT {SAMPLE_WEIGHTED_K}
"""


QUERIES: dict[str, QuerySpec] = {
    "text_pii_redact": QuerySpec(text_pii_redact, PII_ORACLE),
    "split_train_val": QuerySpec(split_train_val, SPLIT_ORACLE),
    "data_profile": QuerySpec(data_profile, PROFILE_ORACLE),
    "merge_upsert": QuerySpec(merge_upsert, MERGE_ORACLE),
    "sample_stratified": QuerySpec(sample_stratified, SAMPLE_STRAT_ORACLE),
    "sample_weighted": QuerySpec(sample_weighted, SAMPLE_WEIGHTED_ORACLE),
    "text_token_topk": QuerySpec(text_token_topk, TOKEN_TOPK_ORACLE),
    "f9_xml_render": QuerySpec(f9_xml_render, _f9_oracle()),
    "f2_chunk_documents": QuerySpec(f2_chunk_documents, _f2_oracle()),
    "f2_chunk_documents_chars": QuerySpec(
        f2_chunk_documents_chars, F2_CHARS_ORACLE
    ),
    "f3_truncate_start": QuerySpec(f3_truncate_start, _trunc_exact_oracle(False)),
    "f4_truncate_end": QuerySpec(f4_truncate_end, _trunc_exact_oracle(True)),
    "f3_truncate_start_words": QuerySpec(f3_truncate_start_words, F3_WORDS_ORACLE),
    "f4_truncate_end_words": QuerySpec(f4_truncate_end_words, F4_WORDS_ORACLE),
    "p3_score_filter": QuerySpec(p3_score_filter, P3_ORACLE),
    "a1_reduce_ordered_concat": QuerySpec(a1_reduce_ordered_concat, A1_ORACLE),
    "f11_normalize": QuerySpec(f11_normalize, F11_ORACLE),
    "f12_extract_numbers": QuerySpec(f12_extract_numbers, F12_ORACLE),
    "text_token_count": QuerySpec(text_token_count, _token_count_oracle()),
    "text_quality_score": QuerySpec(text_quality_score, QUALITY_ORACLE),
    "text_quality_sorted_scan": QuerySpec(
        text_quality_sorted_scan, QUALITY_SORTED_ORACLE
    ),
    "documents_orc_scan": QuerySpec(documents_orc_scan, _FORMAT_SCAN_ORACLE),
    "documents_csv_scan": QuerySpec(documents_csv_scan, _FORMAT_SCAN_ORACLE),
    "text_repetition_metrics": QuerySpec(
        text_repetition_metrics, REPETITION_ORACLE
    ),
    "text_fingerprint": QuerySpec(text_fingerprint, FINGERPRINT_ORACLE),
    "text_langid": QuerySpec(text_langid, LANGID_ORACLE),
}


# ---------------------------------------------------------------------------
# Gopher-style rule filter (Rae et al. 2021 §A1.1) — the standard
# pre-training quality gate battery: document length, mean word
# length, alphabetic-word fraction, and required-stopword presence,
# each reported per document with the combined keep verdict.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MIN_ALPHA = 0.8
GOPHER_MIN_STOP_HITS = 2


def _gopher_metrics(text_col, words=None):
    """The Gopher rule battery over one text column → dict of Columns
    (n, mwl, alpha_frac, stop_hits, keep). The SINGLE definition of
    the gate — shared by the standalone rule query, the composed
    cleaning funnel, and (through cleaning_stage) the streaming
    ingest gate, so the three can never drift apart.

    ``words``: a pre-MATERIALIZED column holding the split of
    text_col. The battery references the word array from 20+ places
    (n, the length fold, the alpha filter, one array_contains per
    stopword) — with the split inline, every reference re-splits the
    document (round-15, the _shingles_of duplication class); callers
    on a hot path project the split once and pass the column ref."""
    if words is None:
        words = F.split(F.trim(text_col), "[ \t\n\f\r]+")
    n = F.size(words)
    total_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mwl = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("^[a-zA-Z]+$")))
    alpha_frac = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    stop_hits = sum(
        F.when(F.array_contains(words, w), 1).otherwise(0) for w in STOPWORDS
    )
    keep = (
        n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mwl.between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
        & (alpha_frac >= GOPHER_MIN_ALPHA)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return {
        "n": n,
        "mwl": mwl,
        "alpha_frac": alpha_frac,
        "stop_hits": stop_hits,
        "keep": keep,
    }


# SQL twin of _gopher_metrics: metric expressions over a word-list
# column ``ws`` and the keep predicate over the metric names.
_GOPHER_M_SQL = f"""
         len(ws) AS n,
         CASE WHEN len(ws) > 0
              THEN CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                   / len(ws)
              ELSE 0.0 END AS mwl,
         CASE WHEN len(ws) > 0
              THEN CAST(len(list_filter(ws, w -> regexp_full_match(w, '[a-zA-Z]+')))
                        AS DOUBLE) / len(ws)
              ELSE 0.0 END AS alpha_frac,
         {" + ".join(f"(CASE WHEN list_contains(ws, '{w}') THEN 1 ELSE 0 END)" for w in STOPWORDS)}
           AS stop_hits"""

_GOPHER_KEEP_SQL = f"""(n BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                  AND mwl BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
                  AND alpha_frac >= {GOPHER_MIN_ALPHA}
                  AND stop_hits >= {GOPHER_MIN_STOP_HITS})"""


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule metrics + keep verdict.

    Scale: a narrow all-JVM projection (split + array folds inside
    whole-stage codegen) — zero shuffle, runs at scan speed; the keep
    column is the predicate a 100 TB cleaning pass would push into
    the write of the filtered corpus.
    """
    docs = _docs(spark, sf_dir).withColumn(
        "__gw", F.split(F.trim(F.col("text")), "[ \t\n\f\r]+")
    )
    m = _gopher_metrics(F.col("text"), words=F.col("__gw"))
    return docs.select(
        "doc_id",
        m["n"].cast("long").alias("n_words"),
        F.round(m["mwl"], 6).alias("mean_word_len"),
        F.round(m["alpha_frac"], 6).alias("alpha_frac"),
        m["stop_hits"].cast("long").alias("stop_hits"),
        m["keep"].cast("int").alias("keep"),
    )


GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
  FROM documents
), m AS (
  SELECT doc_id,{_GOPHER_M_SQL}
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_frac,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       CAST(CASE WHEN {_GOPHER_KEEP_SQL}
             THEN 1 ELSE 0 END AS INT) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# HTML boilerplate extraction — the trafilatura/jusText step every
# web-crawl ingestion pipeline runs before any other text op. The
# page markup is synthesized deterministically around the document
# text (the container has no crawl corpus), so the extraction chain
# itself — script/style block removal, tag stripping, whitespace
# collapse, title capture — is what both engines compute and the
# value hash certifies.
# ---------------------------------------------------------------------------

def _page_expr():
    """The deterministic synthesized HTML page (Spark Column)."""
    return F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" ("),
        F.col("source"),
        F.lit(')</title><script type="text/javascript">var t=1;</script>'),
        F.lit('<style>.nav{color:red}</style></head><body><nav><a href="/">'),
        F.lit("home</a></nav><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><div class="footer">(c) 2026 corp. All rights reserved.'),
        F.lit("</div></body></html>"),
    )


def _extract_expr(page):
    """Boilerplate-stripped main text from an HTML column."""
    no_script = F.regexp_replace(page, "<script[^>]*>.*?</script>", " ")
    no_style = F.regexp_replace(no_script, "<style[^>]*>.*?</style>", " ")
    no_tags = F.regexp_replace(no_style, "<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, "[ \t\n\f\r]+", " "))


# SQL twins of _page_expr/_extract_expr. NOTE the 'g' flag on every
# replace: Spark's regexp_replace is global, DuckDB's defaults to
# first-match-only — without 'g' a document containing its own
# '<script>' text would diverge between the engines.
_PAGE_SQL = """'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' ('
         || source
         || ')</title><script type="text/javascript">var t=1;</script>'
         || '<style>.nav{color:red}</style></head><body><nav><a href="/">'
         || 'home</a></nav><h1>Doc ' || CAST(doc_id AS VARCHAR)
         || '</h1><p>' || text
         || '</p><div class="footer">(c) 2026 corp. All rights reserved.'
         || '</div></body></html>'"""

_EXTRACT_SQL = """trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'g'),
               '<style[^>]*>.*?</style>', ' ', 'g'),
             '<[^>]*>', ' ', 'g'),
           '\\s+', ' ', 'g'))"""


def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, title, html_len, extracted_len,
    boilerplate_ratio) via a pure-JVM regex chain.

    Scale: narrow map over the scan, no shuffle, no Python; at
    100 TB the chain runs inside whole-stage codegen at scan speed.
    The real-crawl variant swaps the synthesized page for the raw
    HTML column; the extraction operators are unchanged.
    """
    docs = _docs(spark, sf_dir)
    page = _page_expr()
    extracted = _extract_expr(page)
    title = F.regexp_extract(page, "<title>([^<]*)</title>", 1)
    return docs.select(
        "doc_id",
        title.alias("title"),
        F.length(page).cast("long").alias("html_len"),
        F.length(extracted).cast("long").alias("extracted_len"),
        F.round(F.lit(1.0) - F.length(extracted) / F.length(page), 6).alias(
            "boilerplate_ratio"
        ),
    )


HTML_EXTRACT_ORACLE = f"""
WITH page AS (
  SELECT doc_id, {_PAGE_SQL} AS html
  FROM documents
), ext AS (
  SELECT doc_id, html,
         {_EXTRACT_SQL} AS extracted
  FROM page
)
SELECT doc_id,
       regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       CAST(length(html) AS BIGINT) AS html_len,
       CAST(length(extracted) AS BIGINT) AS extracted_len,
       round(1.0 - CAST(length(extracted) AS DOUBLE) / length(html), 6)
         AS boilerplate_ratio
FROM ext
"""


QUERIES.update(
    {
        "text_gopher_rules": QuerySpec(text_gopher_rules, GOPHER_ORACLE),
        "text_html_extract": QuerySpec(text_html_extract, HTML_EXTRACT_ORACLE),
    }
)


# ---------------------------------------------------------------------------
# One-plan corpus-cleaning pipeline: HTML extraction ∘ Gopher rule
# gate ∘ exact dedup, reported per source — the composed shape of a
# production cleaning pass (extract once, gate on the EXTRACTED text,
# fingerprint survivors, count unique), all in a single aggregation
# over one scan.
# ---------------------------------------------------------------------------

def cleaning_stage(docs: DataFrame) -> DataFrame:
    """The cleaning funnel as a pure per-row projection:
    (doc_id, source, keep, n_words, fp) from the raw doc columns —
    HTML extraction, Gopher gate (the shared _gopher_metrics
    battery), content fingerprint. No shuffle, no state; streamable
    as-is (the streaming corpus-ingest gate in streaming/pipeline.py
    applies this exact function per micro-batch, twin-tested)."""
    extracted = _extract_expr(_page_expr())
    # materialize the extracted text AND its word split once — the
    # gate references the split 20+ times and the extraction chain
    # is itself a multi-regexp expression (see _gopher_metrics)
    docs = docs.withColumn("__gx", extracted).withColumn(
        "__gw", F.split(F.trim(F.col("__gx")), "[ \t\n\f\r]+")
    )
    m = _gopher_metrics(F.col("__gx"), words=F.col("__gw"))
    return docs.select(
        "doc_id",
        "source",
        m["keep"].alias("keep"),
        m["n"].alias("n_words"),
        F.md5(F.col("__gx")).alias("fp"),
    )


def cleaning_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cleaning funnel: documents → extracted text →
    Gopher keep → exact-dedup distinct count → kept-token volume.

    Scale: the whole funnel is ONE narrow expression chain feeding
    ONE groupBy(source) with map-side combine — the shuffle carries
    |sources| partial rows (count-distinct adds the fingerprint to
    the grouping expansion, still bounded by survivors). No second
    scan, no join: the extract/gate/fingerprint stages compose as
    column expressions, which is the point of keeping each cleaning
    op a pure projection.
    """
    staged = cleaning_stage(_docs(spark, sf_dir))
    return (
        staged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_gopher_keep"),
            F.countDistinct(F.when(F.col("keep"), F.col("fp"))).alias(
                "n_unique_kept"
            ),
            F.sum(
                F.when(F.col("keep"), F.col("n_words")).otherwise(0).cast("long")
            ).alias("tokens_kept"),
        )
    )


CLEANING_REPORT_ORACLE = f"""
WITH page AS (
  SELECT doc_id, source, {_PAGE_SQL} AS html
  FROM documents
), staged AS (
  SELECT doc_id, source, {_EXTRACT_SQL} AS extracted
  FROM page
), gated AS (
  SELECT source, md5(extracted) AS fp,{_GOPHER_M_SQL}
  FROM (SELECT source, extracted, string_split_regex(trim(extracted), '\\s+') AS ws
        FROM staged)
), flagged AS (
  SELECT source, fp, n,
         {_GOPHER_KEEP_SQL} AS keep
  FROM gated
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_keep,
       CAST(count(DISTINCT CASE WHEN keep THEN fp END) AS BIGINT) AS n_unique_kept,
       CAST(sum(CASE WHEN keep THEN n ELSE 0 END) AS BIGINT) AS tokens_kept
FROM flagged GROUP BY source
"""


QUERIES.update(
    {
        "cleaning_pipeline_report": QuerySpec(
            cleaning_pipeline_report, CLEANING_REPORT_ORACLE
        ),
    }
)


# ---------------------------------------------------------------------------
# Snapshot drift report — the data-quality diff every scheduled
# ingest runs before promoting a new corpus snapshot: per-metric
# baseline-vs-candidate comparison with a relative-delta drift flag.
# Snapshots are modeled as the even/odd doc_id halves (the container
# has one corpus version); the OPERATOR — one-pass conditional
# aggregation, metric pivot, thresholded deltas — is what the
# catalog certifies.
# ---------------------------------------------------------------------------

DRIFT_THRESHOLD = 0.05  # |relative delta| beyond this flags drift


def data_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(metric, baseline, candidate, rel_delta, drifted) — one row
    per tracked metric.

    Scale: ONE full-scan aggregation (every metric for both
    snapshots as conditional aggregates — the two-snapshot diff
    never scans twice), then a 4-row in-plan pivot via stack. At
    100 TB with real snapshot tables, the same conditional-agg shape
    runs over the union of two partition ranges.
    """
    docs = _docs(spark, sf_dir)
    base = F.col("doc_id") % 2 == 0
    words = F.size(F.split(F.trim(F.col("text")), "[ \t\n\f\r]+"))

    def cond_avg(pred, value):
        return F.sum(F.when(pred, value).otherwise(0)) / F.sum(
            F.when(pred, 1).otherwise(0)
        )

    agg = docs.agg(
        F.sum(base.cast("long")).cast("double").alias("b_docs"),
        F.sum((~base).cast("long")).cast("double").alias("c_docs"),
        cond_avg(base, F.col("n_chars")).alias("b_chars"),
        cond_avg(~base, F.col("n_chars")).alias("c_chars"),
        cond_avg(base, words).alias("b_words"),
        cond_avg(~base, words).alias("c_words"),
        cond_avg(base, (F.col("lang") == "en").cast("int")).alias("b_en"),
        cond_avg(~base, (F.col("lang") == "en").cast("int")).alias("c_en"),
    )
    stacked = agg.select(
        F.expr(
            "stack(4, 'n_docs', b_docs, c_docs,"
            " 'avg_chars', b_chars, c_chars,"
            " 'avg_words', b_words, c_words,"
            " 'en_rate', b_en, c_en) AS (metric, b, c)"
        )
    )
    rel = (F.col("c") - F.col("b")) / F.col("b")
    return stacked.select(
        "metric",
        F.round("b", 6).alias("baseline"),
        F.round("c", 6).alias("candidate"),
        F.round(rel, 6).alias("rel_delta"),
        (F.abs(rel) > DRIFT_THRESHOLD).cast("int").alias("drifted"),
    )


DRIFT_ORACLE = f"""
WITH m AS (
  SELECT
    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS b_docs,
    CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS c_docs,
    sum(CASE WHEN doc_id % 2 = 0 THEN n_chars ELSE 0 END)
      / sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS b_chars,
    sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars ELSE 0 END)
      / sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS c_chars,
    sum(CASE WHEN doc_id % 2 = 0
             THEN len(string_split_regex(trim(text), '\\s+')) ELSE 0 END)
      / sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS b_words,
    sum(CASE WHEN doc_id % 2 <> 0
             THEN len(string_split_regex(trim(text), '\\s+')) ELSE 0 END)
      / sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS c_words,
    sum(CASE WHEN doc_id % 2 = 0 AND lang = 'en' THEN 1 ELSE 0 END)
      / sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS b_en,
    sum(CASE WHEN doc_id % 2 <> 0 AND lang = 'en' THEN 1 ELSE 0 END)
      / sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS c_en
  FROM documents
), rows_ AS (
  SELECT 'n_docs' AS metric, b_docs AS b, c_docs AS c FROM m
  UNION ALL SELECT 'avg_chars', b_chars, c_chars FROM m
  UNION ALL SELECT 'avg_words', b_words, c_words FROM m
  UNION ALL SELECT 'en_rate', b_en, c_en FROM m
)
SELECT metric,
       round(b, 6) AS baseline,
       round(c, 6) AS candidate,
       round((c - b) / b, 6) AS rel_delta,
       CAST(CASE WHEN abs((c - b) / b) > {DRIFT_THRESHOLD}
            THEN 1 ELSE 0 END AS INT) AS drifted
FROM rows_
"""


QUERIES.update(
    {
        "data_drift_report": QuerySpec(data_drift_report, DRIFT_ORACLE),
    }
)


# ---------------------------------------------------------------------------
# Suffix-automaton substring diversity (round-11 frontier item): the
# compression-style quality signal — distinct substrings and longest
# repeated substring over all ≤K-char windows, per document. Linear
# per-doc suffix automaton (functions/suffix.py) as an Arrow-batched
# mapInPandas stage (Python is inherent: no JVM/SQL linear
# equivalent); the DuckDB oracle brute-forces the identical stats
# from the explicit window multiset (exact but quadratic — the check,
# not the scale path). The K cap (32) bounds the oracle's enumeration
# AND matches how the signal is used (Gopher/RefinedWeb repetition
# filters look at bounded n-gram windows, not unbounded LRS), while
# the automaton itself is built uncapped in linear time.
#
# Ratio rounding happens JVM-SIDE (F.round == SQL ROUND half-up;
# Python's bankers-rounding round() would diverge on exact ties), so
# the Python stage returns integers only — the same all-integer
# engine-parity trick as the perceptron/BPE/PageRank lanes.
# ---------------------------------------------------------------------------

SUBSTR_STATS_K = 32


def text_substring_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, n_windows, n_distinct, diversity,
    longest_repeat): per-doc substring-diversity stats over ≤K-char
    windows. diversity = n_distinct / n_windows (NULL for empty
    docs) — low values flag repetitive/boilerplate text; longest_repeat
    is the capped longest repeated substring."""
    import pandas as pd

    # Parallelism floor for the per-doc automaton stage (round-15,
    # guide §6 "minPartitionNum sets a floor on scan parallelism"):
    # a small corpus scans into ONE split, serializing the whole
    # Python stage onto one core (measured 2.6 → 0.9 s at sf0.1).
    # Guarded so it is a NO-OP at scale — when the scan already has
    # >= defaultParallelism splits nothing is shuffled. Shared helper
    # (operators/parallelism.py): deterministic hash repartition on
    # doc_id, not keyless round-robin.
    from finmapreduce_spark.operators.parallelism import scan_floor

    docs = scan_floor(_docs(spark, sf_dir).select("doc_id", "text"), "doc_id")
    k = SUBSTR_STATS_K

    def gen(batches):
        from finmapreduce_spark.functions.suffix import sam_substring_stats

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text if isinstance(text, str) else ""
                nw, nd, lr = sam_substring_stats(t, k)
                rows.append((doc_id, len(t), nw, nd, lr))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_chars",
                    "n_windows",
                    "n_distinct",
                    "longest_repeat",
                ],
            )

    out = docs.mapInPandas(
        gen,
        "doc_id long, n_chars long, n_windows long, n_distinct long, "
        "longest_repeat long",
    )
    return out.select(
        "doc_id",
        "n_chars",
        "n_windows",
        "n_distinct",
        F.when(
            F.col("n_windows") > 0,
            F.round(F.col("n_distinct") / F.col("n_windows"), 6),
        ).alias("diversity"),
        "longest_repeat",
    )


SUBSTR_DIVERSITY_ORACLE = f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
subs AS (
  SELECT doc_id, substring(t, CAST(i AS INT), CAST(l AS INT)) AS s,
         CAST(l AS BIGINT) AS l
  FROM d,
       LATERAL unnest(range(1, CAST(length(t) AS BIGINT) + 1)) AS a(i),
       LATERAL unnest(range(1, {SUBSTR_STATS_K} + 1)) AS b(l)
  WHERE i + l <= length(t) + 1
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(count(DISTINCT s) AS BIGINT) AS n_distinct
  FROM subs GROUP BY 1
),
rep AS (
  SELECT doc_id, CAST(max(l) AS BIGINT) AS longest_repeat
  FROM (SELECT doc_id, s, l, count(*) AS c FROM subs GROUP BY 1, 2, 3)
  WHERE c > 1 GROUP BY 1
)
SELECT d.doc_id,
       CAST(length(d.t) AS BIGINT) AS n_chars,
       coalesce(agg.n_windows, 0) AS n_windows,
       coalesce(agg.n_distinct, 0) AS n_distinct,
       CASE WHEN agg.n_windows > 0
            THEN round(agg.n_distinct * 1.0 / agg.n_windows, 6)
       END AS diversity,
       coalesce(rep.longest_repeat, 0) AS longest_repeat
FROM d LEFT JOIN agg USING (doc_id) LEFT JOIN rep USING (doc_id)
"""


QUERIES.update(
    {
        "text_substring_diversity": QuerySpec(
            text_substring_diversity, SUBSTR_DIVERSITY_ORACLE
        ),
    }
)


# ---------------------------------------------------------------------------
# Uncapped longest repeated substring — the capped window above
# (SUBSTR_STATS_K=32) matches how repetition FILTERS use the signal;
# this is the uncapped statistic itself (the round-11 open candidate:
# "needs a non-enumerating oracle strategy"). The automaton already
# computes it linearly for any cap, so the Spark side is
# sam_substring_stats(t, len(t)); the oracle is the same monotone
# binary search the LCS containment oracle proved out: "some length-ℓ
# substring repeats" is monotone in ℓ and O(n)-checkable (the
# length-ℓ gram list is longer than its list_distinct), so a
# recursive CTE pins the exact length in ⌈log₂ n⌉ probes — O(n log n)
# per doc, never the O(n²·L) full-window enumeration the capped
# oracle uses (which is exactly why the cap existed).
# ---------------------------------------------------------------------------


def text_longest_repeat_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # same guarded parallelism floor as text_substring_diversity
    from finmapreduce_spark.operators.parallelism import scan_floor

    docs = scan_floor(_docs(spark, sf_dir).select("doc_id", "text"), "doc_id")

    def gen(batches):
        from finmapreduce_spark.functions.suffix import sam_substring_stats

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text if isinstance(text, str) else ""
                # cap = len(t): no length-≥-len(t) substring can repeat,
                # so this IS the uncapped longest repeat
                _, _, lr = sam_substring_stats(t, len(t)) if t else (0, 0, 0)
                rows.append((doc_id, len(t), lr))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_chars", "longest_repeat"]
            )

    out = docs.mapInPandas(
        gen, "doc_id long, n_chars long, longest_repeat long"
    )
    return out.select(
        "doc_id",
        "n_chars",
        "longest_repeat",
        F.round(
            F.col("longest_repeat")
            / F.greatest(F.col("n_chars"), F.lit(1)),
            6,
        ).alias("repeat_frac"),
    )


LONGEST_REPEAT_ORACLE = """
WITH RECURSIVE d AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
), bs AS (
  SELECT doc_id, t, 0 AS lo, greatest(length(t) - 1, 0) AS hi FROM d
  UNION ALL
  SELECT doc_id, t,
         CASE WHEN dup THEN mid ELSE lo END AS lo,
         CASE WHEN dup THEN hi ELSE mid - 1 END AS hi
  FROM (
    SELECT doc_id, t, lo, hi, mid,
           len(list_transform(range(1, length(t) - mid + 2),
                              i -> substr(t, CAST(i AS INT), CAST(mid AS INT))))
           > len(list_distinct(
               list_transform(range(1, length(t) - mid + 2),
                              i -> substr(t, CAST(i AS INT), CAST(mid AS INT)))))
             AS dup
    FROM (SELECT *, (lo + hi + 1) // 2 AS mid FROM bs WHERE lo < hi)
  )
)
SELECT d.doc_id,
       CAST(length(d.t) AS BIGINT) AS n_chars,
       CAST(x.lr AS BIGINT) AS longest_repeat,
       round(x.lr / greatest(length(d.t), 1), 6) AS repeat_frac
FROM (SELECT doc_id, max(lo) AS lr FROM bs GROUP BY 1) x
JOIN d USING (doc_id)
"""

QUERIES.update(
    {
        "text_longest_repeat_uncapped": QuerySpec(
            text_longest_repeat_uncapped, LONGEST_REPEAT_ORACLE
        ),
    }
)
