"""Multimodal pipeline queries.

``multimodal_asset_metadata`` and ``multimodal_frame_sample`` are
pure-expression plans with full DuckDB oracles. The decode/featurize
stage runs real mapInPandas plumbing over binary Arrow batches but its
stub codec output is not SQL-expressible — the driver records the
weaker rows-only check for it (by design; see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finmapreduce_spark.operators.multimodal import (
    decode_and_featurize,
    fake_assets_from_documents,
    frame_sample,
)
from finmapreduce_spark.queries import QuerySpec
from finmapreduce_spark.session import read_table

FRAME_EVERY_MS = 1000


def _assets(spark, sf_dir):
    return fake_assets_from_documents(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def multimodal_asset_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir)
    return assets.groupBy("kind").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("width"), 6).alias("avg_width"),
        F.round(F.avg("height"), 6).alias("avg_height"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )


ASSET_META_ORACLE = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       count(*) AS n_assets,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       round(avg(length(text) % 640 + 16), 6) AS avg_width,
       round(avg(length(text) % 480 + 16), 6) AS avg_height,
       CAST(sum(length(text) * 10) AS BIGINT) AS total_duration_ms
FROM documents GROUP BY 1
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = _assets(spark, sf_dir)
    return frame_sample(assets, FRAME_EVERY_MS)


FRAME_SAMPLE_ORACLE = f"""
SELECT doc_id AS asset_id,
       CAST(t.ms AS BIGINT) AS frame_ms,
       md5(text || ':' || CAST(t.ms AS VARCHAR)) AS frame_key
FROM documents, LATERAL unnest(range(0, length(text) * 10, {FRAME_EVERY_MS})) AS t(ms)
WHERE doc_id % 3 = 2
"""


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode + featurize: rows-only driver check (no oracle —
    the fake codec's byte-level output is not ANSI-SQL-expressible)."""
    decoded = decode_and_featurize(_assets(spark, sf_dir))
    return decoded.groupBy("kind").agg(
        F.count("*").alias("n_assets"),
        F.countDistinct("decoded_md5").alias("n_distinct_decodes"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_feat_0"),
    )


QUERIES: dict[str, QuerySpec] = {
    "multimodal_asset_metadata": QuerySpec(multimodal_asset_metadata, ASSET_META_ORACLE),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, FRAME_SAMPLE_ORACLE),
    "multimodal_decode_features": QuerySpec(multimodal_decode_features, None),
}
