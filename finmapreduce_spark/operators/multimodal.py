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
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from finmapreduce_spark.operators.codecs import (
    decode_audio,
    decode_image,
    decode_y4m,
    decode_y4m_frame,
    encode_ppm,
    encode_wav,
    encode_y4m,
    pcm_to_samples,
    sniff,
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
VIDEO_FPS = 25  # 40 ms per frame


def synth_video_dims(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for the synthetic Y4M asset."""
    return doc_id % 8 + 4, doc_id % 6 + 4, doc_id % 12 + 2


def synth_video_frame(doc_id: int, frame_idx: int, width: int, height: int) -> bytes:
    """Deterministic C444 frame: byte k = (13*d + 5*f + 3*k) % 256.
    Integer formula → the SQL oracle replays any decoded frame.
    Buffers coincide iff doc_id ≡ doc_id' (mod 768): bytes repeat mod
    256, dims mod 24, frame count mod 12 — lcm 768, and 768 ≡ 0 (mod
    3) keeps the class inside the video kind."""
    n = 3 * width * height
    return bytes((13 * doc_id + 5 * frame_idx + 3 * k) % 256 for k in range(n))


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


def _synth_y4m_fn(doc_id: pd.Series) -> pd.Series:
    out = []
    for d in doc_id:
        d = int(d)
        w, h, nf = synth_video_dims(d)
        frames = [synth_video_frame(d, f, w, h) for f in range(nf)]
        out.append(encode_y4m(w, h, frames, VIDEO_FPS))
    return pd.Series(out)


# Built lazily: pandas_udf needs a DataType (not a DDL string) to stay
# importable without an active SparkSession.
_synth_ppm = F.pandas_udf(_synth_ppm_fn, returnType=T.BinaryType())
_synth_wav = F.pandas_udf(_synth_wav_fn, returnType=T.BinaryType())
_synth_y4m = F.pandas_udf(_synth_y4m_fn, returnType=T.BinaryType())


def fake_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic corpus: ALL THREE kinds are REAL
    decodable containers — binary PPM images, RIFF WAVs, and
    YUV4MPEG2 videos — built from integer formulas the SQL oracles
    replay. The md5 double remains only for containers this image
    genuinely cannot decode (JPEG/MP3/MP4) and for malformed
    payloads. Lets every downstream stage run for real on synthetic
    binaries."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    is_img = F.col("doc_id") % 3 == 0
    is_aud = F.col("doc_id") % 3 == 1
    img_w = (F.col("doc_id") % 16 + 4).cast("int")
    img_h = (F.col("doc_id") % 12 + 4).cast("int")
    vid_w = (F.col("doc_id") % 8 + 4).cast("int")
    vid_h = (F.col("doc_id") % 6 + 4).cast("int")
    n_frames = F.col("doc_id") % 12 + 2
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.when(is_img, _synth_ppm("doc_id"))
        .when(is_aud, _synth_wav("doc_id"))
        .otherwise(_synth_y4m("doc_id"))
        .alias("payload"),
        F.when(is_img, F.lit("image/x-portable-pixmap"))
        .when(is_aud, F.lit("audio/wav"))
        .otherwise(F.lit("video/x-yuv4mpeg"))
        .alias("mime"),
        F.when(is_img, img_w)
        .when(is_aud, (F.length("text") % 640 + 16).cast("int"))
        .otherwise(vid_w)
        .alias("width"),
        F.when(is_img, img_h)
        .when(is_aud, (F.length("text") % 480 + 16).cast("int"))
        .otherwise(vid_h)
        .alias("height"),
        # video duration is REAL (frames / fps); image/audio keep the
        # synthetic text-derived stamp (duration is not a property of
        # a still image, and the WAV's true length is n/rate seconds —
        # carried by the payload itself)
        F.when(
            F.col("doc_id") % 3 == 2,
            (n_frames * (1000 // VIDEO_FPS)).cast("long"),
        )
        .otherwise((F.length("text") * 10).cast("long"))
        .alias("duration_ms"),
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
                p = p or b""
                container = sniff(p)
                try:
                    if container in ("ppm", "bmp"):
                        _, _, rgb = decode_image(p)
                        md5s.append(hashlib.md5(rgb).hexdigest())
                        feats.append(pixel_features(rgb))
                        continue
                    if container == "wav":
                        _, pcm = decode_audio(p)
                        md5s.append(hashlib.md5(pcm).hexdigest())
                        feats.append(audio_features(pcm_to_samples(pcm)))
                        continue
                    if container == "y4m":
                        _, _, frames = decode_y4m(p)
                        buf = b"".join(frames)
                        md5s.append(hashlib.md5(buf).hexdigest())
                        feats.append(pixel_features(buf))
                        continue
                except (ValueError, struct.error):
                    # magic-coincidence payload (e.g. text starting
                    # with 'BM') or a truncated container: the
                    # documented contract is the md5 double, never a
                    # task failure that aborts the whole decode stage
                    pass
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


FRAME_SAMPLE_SCHEMA = (
    "asset_id long, frame_ms long, frame_idx long, frame_key string, "
    "f_mean double"
)


def frame_sample(assets: DataFrame, every_ms: int = 80) -> DataFrame:
    """REAL frame sampling for video assets: one row per sampled
    timestamp, each decoded by the Y4M codec's O(1) frame seek — a
    task reads only the bytes of the frames it samples, never the
    whole container. One mapInPandas pass per asset partition: the
    payload is decoded once per asset (header parse), then each
    sampled frame is sliced out and summarized (content digest over
    the frame's lowercase hex + mean intensity).

    At 100 TB: this is the narrow-map shape video curation needs —
    payloads stay in their scan partitions, sampling cost is
    (frames sampled) × (frame size), and the knob is
    maxPartitionBytes. Containers with inter-frame compression would
    swap the seek for a keyframe index; the stage contract (payload →
    rows of (frame_ms, key, features)) is unchanged."""
    ms_per_frame = 1000 // VIDEO_FPS
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", "payload", "duration_ms"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                for ms in range(0, int(dur), every_ms):
                    idx = ms // ms_per_frame
                    frame = decode_y4m_frame(payload, idx)
                    key = hashlib.md5(frame.hex().encode()).hexdigest()
                    n = len(frame)
                    rows.append(
                        (int(aid), ms, idx, key, (sum(frame) / n) / 255.0)
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "frame_ms", "frame_idx", "frame_key",
                        "f_mean",
                    ],
                )

    return vids.mapInPandas(mapper, schema=FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, src_w int, src_h int, thumb binary, "
    "thumb_checksum long, thumb_mean double"
)


def resize_images(
    assets: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """REAL nearest-neighbor image resize over the binary payload
    column: decode (stdlib PPM/BMP codec) → numpy index-select to the
    (out_h, out_w) thumbnail → emit the thumbnail RGB bytes plus an
    order-proof integer certification (position-weighted byte
    checksum) and the mean intensity.

    Source pixel for thumb (ty, tx) is (ty*src_h)//out_h,
    (tx*src_w)//out_w — pure integer arithmetic, which is what lets
    the SQL oracle reconstruct every thumbnail byte from the synth
    formula. One Arrow mapInPandas pass; at 100 TB this is the
    thumbnailing map stage of an image-curation pipeline (swap the
    codec for PIL/turbojpeg, the stage contract is unchanged).
    """
    import numpy as np

    imgs = assets.filter(F.col("kind") == "image").select(
        "asset_id", "payload"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                thumb = arr[ys][:, xs, :]
                flat = thumb.reshape(-1).astype(np.int64)
                checksum = int(
                    ((np.arange(len(flat)) + 1) * flat).sum()
                )
                rows.append(
                    (
                        int(aid),
                        int(w),
                        int(h),
                        thumb.tobytes(),
                        checksum,
                        float(flat.sum()) / len(flat) / 255.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "src_w",
                    "src_h",
                    "thumb",
                    "thumb_checksum",
                    "thumb_mean",
                ],
            )

    return imgs.mapInPandas(mapper, schema=RESIZE_SCHEMA)


DHASH_W = DHASH_H = 8  # 64-bit difference hash
DHASH_BANDS = 4  # 4 × 16-bit bands → Hamming ≤ 3 recall 1.0 (pigeonhole)
DHASH_SCHEMA = "asset_id long, b0 long, b1 long, b2 long, b3 long"


def dhash_images(assets: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over the binary image
    payloads — the signature stage of image near-dup dedup (the
    multimodal analog of the simhash text signature; reference parity:
    the reference has no image lane, this extends the dedup family per
    the training-data-pipeline brief).

    REAL decode (stdlib PPM/BMP codec) → integer grayscale
    (r+g+b)//3 → nearest-neighbor resize to DHASH_H × (DHASH_W+1)
    (same (i*src)//out index math as resize_images, so the SQL oracle
    can reconstruct every sampled gray value from the synth formula)
    → bit(y,x) = gray(y,x) > gray(y,x+1), 64 bits MSB-first.

    The hash is emitted as FOUR 16-bit band integers (b0 = bits 0–15)
    rather than one BIGINT: the bands are exactly the Manku-style LSH
    blocking keys the pair join needs, and keeping them ≤ 16 bits
    sidesteps 64-bit sign arithmetic in both engines. One Arrow
    mapInPandas pass, one decode per image; at 100 TB swap the codec
    for PIL/turbojpeg — the stage contract (binary in, 4 longs out)
    is unchanged.
    """
    import numpy as np

    imgs = assets.filter(F.col("kind") == "image").select(
        "asset_id", "payload"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, rgb = decode_image(bytes(payload))
                arr = (
                    np.frombuffer(rgb, dtype=np.uint8)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                gray = arr.sum(axis=2) // 3
                ys = (np.arange(DHASH_H) * h) // DHASH_H
                xs = (np.arange(DHASH_W + 1) * w) // (DHASH_W + 1)
                g = gray[ys][:, xs]
                bits = (g[:, :DHASH_W] > g[:, 1:]).reshape(-1)
                bands = []
                for k in range(DHASH_BANDS):
                    v = 0
                    for j in range(16):
                        v = (v << 1) | int(bits[16 * k + j])
                    bands.append(v)
                rows.append((int(aid), *bands))
            yield pd.DataFrame(
                rows, columns=["asset_id", "b0", "b1", "b2", "b3"]
            )

    return imgs.mapInPandas(mapper, schema=DHASH_SCHEMA)


AFP_BITS = 64  # 1-D difference hash over the |amplitude| envelope
AFP_SCHEMA = "asset_id long, b0 long, b1 long, b2 long, b3 long"


def afp_audio(assets: DataFrame) -> DataFrame:
    """Acoustic fingerprint over the binary WAV payloads — the audio
    member of the multimodal dedup family (dhash_images' 1-D twin).

    REAL decode (stdlib RIFF/WAV codec) → |amplitude| envelope →
    nearest-neighbor resample to AFP_BITS+1 points (same (i*n)//out
    index math as the image resize, oracle-reconstructible) →
    bit(i) = env(i) > env(i+1), 64 bits MSB-first, emitted as FOUR
    16-bit Manku band integers. A re-encode or level-preserving copy
    of the same source keeps the envelope SHAPE, which is what the
    difference bits capture; absolute gain shifts cancel in the
    comparisons. One Arrow mapInPandas pass, one decode per asset;
    swap the codec for ffmpeg at production, stage contract
    unchanged."""
    import numpy as np

    auds = assets.filter(F.col("kind") == "audio").select(
        "asset_id", "payload"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, pcm = decode_audio(bytes(payload))
                s = np.array(pcm_to_samples(pcm), dtype=np.int64)
                env = np.abs(s)
                idx = (np.arange(AFP_BITS + 1) * len(s)) // (AFP_BITS + 1)
                e = env[idx]
                bits = (e[:AFP_BITS] > e[1:])
                bands = []
                for k in range(4):
                    v = 0
                    for j in range(16):
                        v = (v << 1) | int(bits[16 * k + j])
                    bands.append(v)
                rows.append((int(aid), *bands))
            yield pd.DataFrame(
                rows, columns=["asset_id", "b0", "b1", "b2", "b3"]
            )

    return auds.mapInPandas(mapper, schema=AFP_SCHEMA)
