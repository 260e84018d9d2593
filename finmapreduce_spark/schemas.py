"""Fixed per-stage schemas (SURVEY §1, FIXTURES.md).

The reference passes schemaless Python dicts between stages
(``qa_pair.update(...)``, reference src/core/mapreduce_pipeline.py:170);
here every stage has a declared StructType so Catalyst can prune
columns and the Arrow boundary is typed. "Maybe-missing keys" become
nullable fields.
"""

from __future__ import annotations

from pyspark.sql import types as T

# FinanceBench-shaped QA row (reference src/loaders/financebench_loader.py:40-50)
QA_SCHEMA = T.StructType(
    [
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("doc_name", T.StringType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), True),
        T.StructField("justification", T.StringType(), True),
        T.StructField("evidence", T.ArrayType(T.StringType()), True),
        T.StructField("question_type", T.StringType(), True),
        T.StructField("question_reasoning", T.StringType(), True),
    ]
)

# FinQA-shaped QA row (reference src/loaders/finqa_loader.py:41-48)
QA_FINQA_SCHEMA = T.StructType(
    [
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("doc_name", T.StringType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
        T.StructField("explanation", T.StringType(), True),
    ]
)

# Parsed document (reference src/utils/document_processing.py:357,385)
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_name", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("token_count", T.LongType(), True),
    ]
)

# Chunk row produced by the splitter (reference document_processing.py:246-267)
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_name", T.StringType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("chunk_text", T.StringType(), False),
    ]
)

# Usage metadata struct returned by every LLM stage (reference
# base_pipeline.py:321-338 — one typed struct kills 4 dict-shape duplicates)
USAGE_SCHEMA = T.StructType(
    [
        T.StructField("input_tokens", T.LongType(), True),
        T.StructField("output_tokens", T.LongType(), True),
        T.StructField("cache_read_tokens", T.LongType(), True),
    ]
)

# JSON-format map result (reference config/prompts/map_prompt.yml:139-147,
# src/formatters/json_formatter.py:137-150)
MAP_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("summary", T.StringType(), True),
        T.StructField("terms", T.ArrayType(T.StringType()), True),
        T.StructField("evidence", T.ArrayType(T.StringType()), True),
        T.StructField("answer", T.StringType(), True),
        T.StructField("relevance_score", T.IntegerType(), True),
    ]
)

# Full map-stage output row (hybrid/plain carry `content` instead of json)
MAP_ROW_SCHEMA = T.StructType(
    [
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("map_result", MAP_RESULT_SCHEMA, True),
        T.StructField("content", T.StringType(), True),
        T.StructField("usage", USAGE_SCHEMA, True),
        T.StructField("error", T.StringType(), True),
    ]
)

# Reduce output (reference config/prompts/reduce_prompt.yml:222-230,
# json_formatter.py:100-128)
ANSWER_SCHEMA = T.StructType(
    [
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("llm_answer", T.StringType(), True),
        T.StructField("llm_reasoning", T.StringType(), True),
        T.StructField("llm_evidence", T.ArrayType(T.StringType()), True),
        T.StructField("usage", USAGE_SCHEMA, True),
    ]
)

# Judge output (reference config/prompts/judge_prompt.yml:215-222,
# src/evaluation/async_evaluation.py:406-418)
JUDGMENT_DOMAIN = ("Correct", "Coherent", "Deviated", "Incorrect", "No answer")
JUDGMENT_SCHEMA = T.StructType(
    [
        T.StructField("qa_id", T.LongType(), False),
        T.StructField("judgment", T.StringType(), True),
        T.StructField("reasoning", T.StringType(), True),
        T.StructField("usage", USAGE_SCHEMA, True),
    ]
)

# Multimodal asset row: opaque binary payload + typed metadata
# (north-star extension; decode stages are stubbed — see
# operators/multimodal.py)
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
