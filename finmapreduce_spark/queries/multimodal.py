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
    """Stubbed decode + featurize through the REAL mapInPandas stage.

    Exact SQL oracle despite the binary hop: the stub's decoded buffer
    is a fixed bijection of md5(payload) (digest cycled to 64 bytes),
    so count(DISTINCT decoded_md5) == count(DISTINCT md5(text)); and
    feature[0] is digest byte 0 / 255, which is hex-pair arithmetic on
    the md5 string — both ANSI-expressible, so the driver can value-
    check the whole Arrow decode stage, not just row counts."""
    decoded = decode_and_featurize(_assets(spark, sf_dir))
    return decoded.groupBy("kind").agg(
        F.count("*").alias("n_assets"),
        F.countDistinct("decoded_md5").alias("n_distinct_decodes"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_feat_0"),
    )


DECODE_FEATURES_ORACLE = """
WITH a AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         md5(text) AS h
  FROM documents
)
SELECT kind, count(*) AS n_assets,
       count(DISTINCT h) AS n_distinct_decodes,
       round(avg(((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef', substring(h, 2, 1)) - 1)
                 / 255.0), 6) AS avg_feat_0
FROM a GROUP BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "multimodal_asset_metadata": QuerySpec(multimodal_asset_metadata, ASSET_META_ORACLE),
    "multimodal_frame_sample": QuerySpec(multimodal_frame_sample, FRAME_SAMPLE_ORACLE),
    "multimodal_decode_features": QuerySpec(
        multimodal_decode_features, DECODE_FEATURES_ORACLE
    ),
}


# ---------------------------------------------------------------------------
# End-to-end multimodal retrieval: binary asset → decode/featurize
# (REAL mapInPandas plumbing; the stub codec is md5-derived, so the
# oracle can recompute the identical feature vectors in SQL) → ANN
# brute-force top-k among image assets. This value-checks the entire
# multimodal chain, not just its metadata.
# ---------------------------------------------------------------------------

MM_N_QUERIES = 10
MM_TOP_K = 3


def multimodal_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from finmapreduce_spark.queries.dedup import _dot

    feats = (
        decode_and_featurize(_assets(spark, sf_dir))
        .filter(F.col("kind") == "image")
        .select(
            "asset_id",
            F.col("feature").alias("v"),
        )
        .withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    )
    q = feats.filter(F.col("asset_id") < MM_N_QUERIES * 3).select(
        F.col("asset_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("norm").alias("q_norm"),
    )
    pairs = F.broadcast(q).crossJoin(
        feats.filter(F.col("asset_id") >= MM_N_QUERIES * 3)
    )
    cos = _dot(F.col("q_v"), F.col("v")) / (F.col("q_norm") * F.col("norm"))
    ranked = pairs.select(
        "q_id", F.col("asset_id").alias("neighbor_id"), cos.alias("cosine")
    ).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= MM_TOP_K).select(
        "q_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine")
    )


# The stub decode is md5(payload).digest() cycled; feature[i] =
# digest_byte[i] / 255 for i in 0..15 — reconstructed from the hex
# string: byte i = 16*hex[2i] + hex[2i+1].
_MM_FEATURE_SQL = """
  SELECT doc_id AS asset_id,
         list_transform(range(1, 17), i ->
           ((strpos('0123456789abcdef', substring(md5(text), 2*i - 1, 1)) - 1) * 16
            + strpos('0123456789abcdef', substring(md5(text), 2*i, 1)) - 1) / 255.0
         ) AS v
  FROM documents WHERE doc_id % 3 = 0
"""

MM_ANN_ORACLE = f"""
WITH feats AS (
  SELECT asset_id, v,
         sqrt(list_inner_product(v, v)) AS norm
  FROM ({_MM_FEATURE_SQL})
),
q AS (SELECT asset_id AS q_id, v AS q_v, norm AS q_norm
      FROM feats WHERE asset_id < {MM_N_QUERIES * 3}),
scored AS (
  SELECT q.q_id, c.asset_id AS neighbor_id,
         list_inner_product(q.q_v, c.v) / (q.q_norm * c.norm) AS cosine
  FROM q CROSS JOIN feats c WHERE c.asset_id >= {MM_N_QUERIES * 3}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INT) AS rank, neighbor_id, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= {MM_TOP_K}
"""

QUERIES["multimodal_ann_topk"] = QuerySpec(multimodal_ann_topk, MM_ANN_ORACLE)
