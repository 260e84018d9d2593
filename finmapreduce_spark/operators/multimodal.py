"""Multimodal columns (north-star extension): image/audio/video as
opaque ``binary`` payloads + typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED: the real implementation would use
PIL/ffmpeg/torchaudio, none of which ship in this image. The stub is
a clearly-marked deterministic fake behind the same interface, so the
Spark-side plumbing — schema, binary Arrow transfer, batch shapes,
partitioning — is real and tested; swapping in a real codec changes
only the inner function.

At 100 TB: binary payloads ride in parquet (or are late-materialized
via paths + ``spark.read.format("binaryFile")``); decode stages are
narrow maps, so the only knobs are ``spark.sql.files.maxPartitionBytes``
(bound batch memory — payloads are big) and partition count for
decoder parallelism. Feature vectors come back as ``array<double>``
columns that flow straight into the similarity/dedup operators
(queries/similarity.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finmapreduce_spark.schemas import ASSET_SCHEMA  # noqa: F401  (public contract)

REAL_CODECS_AVAILABLE = False  # flipped when PIL/ffmpeg exist


def fake_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake corpus: each document's utf-8 bytes become an
    asset payload with metadata derived from its length. Lets every
    downstream stage run for real on synthetic binaries."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.length("text") % 640 + 16).cast("int").alias("width"),
        (F.length("text") % 480 + 16).cast("int").alias("height"),
        (F.length("text") * 10).cast("long").alias("duration_ms"),
    )


def _stub_decode(payload: bytes) -> bytes:
    """STUB decode. A real build decodes the container to raw frames.

    Deterministic fake: the 'decoded' buffer is the md5 digest cycled
    to 64 bytes — stable, content-derived, cheap.
    """
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in this image")
    digest = hashlib.md5(payload or b"").digest()
    return (digest * 4)[:64]


DECODED_SCHEMA = (
    "asset_id long, kind string, n_bytes long, decoded_md5 string, "
    "feature array<double>"
)


def decode_and_featurize(assets: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """mapInPandas decode + feature-extraction stage.

    Per batch: decode payload (stub), emit byte stats and a 16-dim
    feature vector (bytes of the digest normalized to [0,1]) — the
    shape a real image/audio embedder would return, feeding the ANN
    operators downstream.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            decoded = [_stub_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "decoded_md5": [hashlib.md5(d).hexdigest() for d in decoded],
                    "feature": [
                        [b / 255.0 for b in d[:16]] for d in decoded
                    ],
                }
            )

    return assets.mapInPandas(mapper, schema=DECODED_SCHEMA)


def frame_sample(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video assets: one row per sampled
    timestamp (the decode of each frame is the stub). Pure expression
    fan-out — sequence+explode, no Python for the plan itself."""
    vids = assets.filter(F.col("kind") == "video")
    stamps = F.sequence(
        F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
    )
    return vids.select(
        "asset_id",
        F.explode(stamps).alias("frame_ms"),
        F.md5(F.concat(F.col("payload"), F.lit(":"), F.col("frame_ms").cast("string")))
        .alias("frame_key"),
    )
