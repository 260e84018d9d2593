"""S9 — persistent parse/chunk cache as a Parquet table.

Reference: pickle files keyed by md5(name+method+params+mtime+size)
(/root/reference/src/utils/document_processing.py:103-189). Spark
version: one partitioned Parquet cache table keyed the same way; a
run joins its wanted keys against the cache, parses only the misses,
and appends them — idempotent re-runs parse nothing.

At 100 TB the cache IS the documents table: parsing (PDF→markdown,
S4/S5) happens once per (doc, parser, params) ever, and every later
run is a broadcast-join against parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finmapreduce_spark.functions.text import md5_key

CACHE_SCHEMA = (
    "cache_key string, doc_name string, parser string, chunk_size int, "
    "chunk_overlap int, content string"
)


def cache_key_col(
    doc_name, parser: str, chunk_size: int, chunk_overlap: int
):
    """F17 key: md5 over identity + parse parameters (mtime/size folded
    in by the caller when it has file stats)."""
    return md5_key(
        doc_name,
        F.lit(parser),
        F.lit(str(chunk_size)),
        F.lit(str(chunk_overlap)),
    )


class ParseCache:
    def __init__(self, spark: SparkSession, cache_dir: str):
        self.spark = spark
        self.cache_dir = cache_dir

    def _exists(self) -> bool:
        return os.path.isdir(self.cache_dir) and any(
            n.endswith(".parquet") for n in os.listdir(self.cache_dir)
        )

    def load(self) -> DataFrame:
        if self._exists():
            return self.spark.read.parquet(self.cache_dir)
        return self.spark.createDataFrame([], CACHE_SCHEMA)

    def get_or_parse(
        self,
        docs: DataFrame,  # (doc_name, raw) — raw is whatever the parser eats
        parser_fn,  # Column-level fn: raw -> parsed content
        parser: str,
        chunk_size: int,
        chunk_overlap: int,
    ) -> DataFrame:
        """Return (doc_name, content) for every input doc, parsing only
        cache misses and appending them to the cache table."""
        keyed = docs.withColumn(
            "cache_key", cache_key_col(F.col("doc_name"), parser, chunk_size, chunk_overlap)
        )
        cached = self.load().filter(
            (F.col("parser") == parser)
            & (F.col("chunk_size") == chunk_size)
            & (F.col("chunk_overlap") == chunk_overlap)
        ).select("cache_key", "content")
        hits = keyed.join(F.broadcast(cached), "cache_key").select(
            "doc_name", "content"
        )
        misses = keyed.join(F.broadcast(cached), "cache_key", "left_anti")
        parsed = misses.select(
            "cache_key",
            "doc_name",
            parser_fn(F.col("raw")).alias("content"),
        )
        if not parsed.isEmpty():
            (
                parsed.select(
                    "cache_key",
                    "doc_name",
                    F.lit(parser).alias("parser"),
                    F.lit(chunk_size).alias("chunk_size"),
                    F.lit(chunk_overlap).alias("chunk_overlap"),
                    "content",
                )
                .write.mode("append")
                .parquet(self.cache_dir)
            )
        return hits.unionByName(parsed.select("doc_name", "content"))
