"""Multimodal columns (north-star extension): image/audio/video as
opaque ``binary`` payloads + typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode step is REAL for image AND audio payloads: a pure-stdlib
PPM/BMP pixel codec and RIFF/WAV PCM codec (operators/codecs.py)
decode recognized containers, and the features are genuine signal
statistics (pixel channel means/intensity histogram; waveform
mean/RMS/zero-crossings/peak/amplitude histogram). Payloads whose
container is not recognized (the synthetic video double, or any
format needing PIL/ffmpeg — not in this image) fall back to a
clearly-marked deterministic md5 double behind the same interface, so
the Spark-side plumbing — schema, binary Arrow transfer, batch shapes,
partitioning — is identical on both paths and swapping in a richer
codec changes only the inner function.

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
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from finmapreduce_spark.operators.codecs import (
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
    pcm_to_samples,
)
from finmapreduce_spark.schemas import ASSET_SCHEMA  # noqa: F401  (public contract)

N_HIST_BINS = 12  # feature dims: 3 channel means + overall mean + 12 bins


def synth_image_pixels(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic synthetic pixels: byte k = (31*doc_id + 7*k) % 256.

    The formula is pure integer arithmetic so the DuckDB oracle can
    reconstruct the decoded image (and therefore the pixel features)
    of every synthesized asset in SQL — that is what upgrades the
    decode stage's driver check from rows-only to full value-hash.
    """
    n = width * height * 3
    return bytes((31 * doc_id + 7 * k) % 256 for k in range(n))


def synth_image_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 16 + 4, doc_id % 12 + 4


AUDIO_RATE = 8000


def synth_audio_n(doc_id: int) -> int:
    return doc_id % 256 + 64


def synth_audio_samples(doc_id: int) -> list[int]:
    """Deterministic synthetic 16-bit samples:
    s_k = ((17*doc_id + 11*k) % 4096) - 2048. Integer formula, so the
    SQL oracle reconstructs the decoded waveform exactly (same
    contract as the image pixels). Two audio buffers coincide iff
    doc_id ≡ doc_id' (mod 4096) with equal n (mod 256 ⊂ mod 4096) —
    and within the audio class (doc_id % 3 == 1) that needs a
    doc_id gap of 3·4096 = 12288."""
    n = synth_audio_n(doc_id)
    return [((17 * doc_id + 11 * k) % 4096) - 2048 for k in range(n)]


def _synth_ppm_fn(doc_id: pd.Series) -> pd.Series:
    out = []
    for d in doc_id:
        d = int(d)
        w, h = synth_image_dims(d)
        out.append(encode_ppm(w, h, synth_image_pixels(d, w, h)))
    return pd.Series(out)


def _synth_wav_fn(doc_id: pd.Series) -> pd.Series:
    import struct

    out = []
    for d in doc_id:
        s = synth_audio_samples(int(d))
        pcm = struct.pack("<%dh" % len(s), *s)
        out.append(encode_wav(AUDIO_RATE, pcm))
    return pd.Series(out)


# Built lazily: pandas_udf needs a DataType (not a DDL string) to stay
# importable without an active SparkSession.
_synth_ppm = F.pandas_udf(_synth_ppm_fn, returnType=T.BinaryType())
_synth_wav = F.pandas_udf(_synth_wav_fn, returnType=T.BinaryType())


def fake_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic corpus: image assets are REAL binary PPM
    images and audio assets are REAL RIFF WAVs (both decodable by the
    stdlib codec, both from integer formulas the SQL oracles replay);
    video payloads are the document's utf-8 bytes (opaque to the
    codec — they exercise the md5 fallback). Lets every downstream
    stage run for real on synthetic binaries."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    is_img = F.col("doc_id") % 3 == 0
    is_aud = F.col("doc_id") % 3 == 1
    img_w = (F.col("doc_id") % 16 + 4).cast("int")
    img_h = (F.col("doc_id") % 12 + 4).cast("int")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.when(is_img, _synth_ppm("doc_id"))
        .when(is_aud, _synth_wav("doc_id"))
        .otherwise(F.encode("text", "utf-8"))
        .alias("payload"),
        F.when(is_img, F.lit("image/x-portable-pixmap"))
        .when(is_aud, F.lit("audio/wav"))
        .otherwise(F.concat(F.lit("application/x-fake-"), kind))
        .alias("mime"),
        F.when(is_img, img_w)
        .otherwise((F.length("text") % 640 + 16).cast("int"))
        .alias("width"),
        F.when(is_img, img_h)
        .otherwise((F.length("text") % 480 + 16).cast("int"))
        .alias("height"),
        (F.length("text") * 10).cast("long").alias("duration_ms"),
    )


def pixel_features(rgb: bytes) -> list[float]:
    """16-dim feature vector from raw RGB bytes.

    [mean_R, mean_G, mean_B, mean_all] / 255 followed by a 12-bin
    intensity histogram (fractions). Every entry is a ratio of exact
    integers, so any engine recomputing it in double arithmetic gets
    bit-identical values — the property the SQL oracle relies on.
    """
    n = len(rgb)
    if n == 0:
        return [0.0] * (4 + N_HIST_BINS)
    chan_sums = [0, 0, 0]
    hist = [0] * N_HIST_BINS
    total = 0
    for k, b in enumerate(rgb):
        chan_sums[k % 3] += b
        hist[b * N_HIST_BINS // 256] += 1
        total += b
    m = n // 3
    feats = [(s / m) / 255.0 for s in chan_sums]
    feats.append((total / n) / 255.0)
    feats.extend(c / n for c in hist)
    return feats


def audio_features(samples: list[int]) -> list[float]:
    """16-dim feature vector from signed 16-bit samples.

    [mean, rms, zero-crossing rate, peak] (amplitude terms / 32768,
    full 16-bit scale) followed by a 12-bin amplitude histogram over
    the full range (fractions). Every entry is a ratio of exact
    integers or an IEEE sqrt of one, so any engine recomputing it in
    double arithmetic matches bit-for-bit — the SQL-oracle contract.
    """
    n = len(samples)
    if n == 0:
        return [0.0] * (4 + N_HIST_BINS)
    total = sumsq = peak = zc = 0
    hist = [0] * N_HIST_BINS
    prev_nonneg = samples[0] >= 0
    for s in samples:
        total += s
        sumsq += s * s
        a = -s if s < 0 else s
        if a > peak:
            peak = a
        nonneg = s >= 0
        if nonneg != prev_nonneg:
            zc += 1
        prev_nonneg = nonneg
        hist[(s + 32768) * N_HIST_BINS // 65536] += 1
    feats = [
        (total / n) / 32768.0,
        math.sqrt(sumsq / n) / 32768.0,
        zc / (n - 1) if n > 1 else 0.0,
        peak / 32768.0,
    ]
    feats.extend(c / n for c in hist)
    return feats


def _stub_decode(payload: bytes) -> bytes:
    """Fallback decode DOUBLE for unrecognized containers. A real build
    with PIL/ffmpeg would decode here; this image has neither, so the
    'decoded' buffer is the md5 digest cycled to 64 bytes — stable,
    content-derived, cheap, and reconstructible by the SQL oracle.
    """
    digest = hashlib.md5(payload or b"").digest()
    return (digest * 4)[:64]


DECODED_SCHEMA = (
    "asset_id long, kind string, n_bytes long, decoded_md5 string, "
    "feature array<double>"
)


def decode_and_featurize(assets: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """mapInPandas decode + feature-extraction stage.

    Per batch: decode the payload — REAL pixel decode for PPM/BMP
    containers (features = pixel statistics, decoded_md5 = digest of
    the raw RGB buffer), md5 double otherwise (features = digest bytes
    normalized). Both paths emit the same 16-dim array<double> shape
    that feeds the ANN operators downstream.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            md5s, feats = [], []
            for p in pdf["payload"]:
                img = decode_image(p or b"")
                aud = None if img else decode_audio(p or b"")
                if img is not None:
                    _, _, rgb = img
                    md5s.append(hashlib.md5(rgb).hexdigest())
                    feats.append(pixel_features(rgb))
                elif aud is not None:
                    _, pcm = aud
                    md5s.append(hashlib.md5(pcm).hexdigest())
                    feats.append(audio_features(pcm_to_samples(pcm)))
                else:
                    d = _stub_decode(p)
                    md5s.append(hashlib.md5(d).hexdigest())
                    feats.append([b / 255.0 for b in d[:16]])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "decoded_md5": md5s,
                    "feature": feats,
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
