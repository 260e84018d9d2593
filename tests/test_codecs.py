"""Stdlib PPM/BMP codec + pixel-feature unit tests (no Spark)."""

from __future__ import annotations

import hashlib

import pytest

from finmapreduce_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    sniff,
)
from finmapreduce_spark.operators.multimodal import (
    N_HIST_BINS,
    pixel_features,
    synth_image_dims,
    synth_image_pixels,
)


def _rgb(w, h, seed=0):
    return bytes((seed + 5 * k) % 256 for k in range(w * h * 3))


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (19, 15), (7, 1)])
def test_ppm_roundtrip(w, h):
    rgb = _rgb(w, h, seed=w * h)
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


def test_ppm_header_with_comments_and_multi_whitespace():
    rgb = _rgb(2, 2)
    payload = b"P6\n# a comment\n 2\t2\n# more\n255\n" + rgb
    assert decode_ppm(payload) == (2, 2, rgb)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (5, 2), (19, 15)])
def test_bmp_roundtrip_including_row_padding(w, h):
    # w=5 → stride 16 vs 15: exercises the 4-byte row padding
    rgb = _rgb(w, h, seed=w + h)
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


def test_sniff_and_dispatch():
    rgb = _rgb(3, 3)
    assert sniff(encode_ppm(3, 3, rgb)) == "ppm"
    assert sniff(encode_bmp(3, 3, rgb)) == "bmp"
    assert sniff(b"plain text") is None
    assert decode_image(encode_bmp(3, 3, rgb)) == (3, 3, rgb)
    assert decode_image(b"not an image") is None
    assert decode_image(b"") is None


def test_truncated_payloads_raise():
    rgb = _rgb(4, 4)
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(4, 4, rgb)[:-5])
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(4, 4, rgb)[:-5])
    with pytest.raises(ValueError):
        encode_ppm(4, 4, rgb[:-1])


def test_pixel_features_shape_and_values():
    # 2x1 image: pixels RGB = (0,10,20),(30,40,50)
    rgb = bytes([0, 10, 20, 30, 40, 50])
    f = pixel_features(rgb)
    assert len(f) == 4 + N_HIST_BINS
    assert f[0] == ((0 + 30) / 2) / 255.0  # mean R
    assert f[1] == ((10 + 40) / 2) / 255.0  # mean G
    assert f[2] == ((20 + 50) / 2) / 255.0  # mean B
    assert f[3] == (sum(rgb) / 6) / 255.0
    # histogram: bin = b*12//256 → bins 0,0,0,1,1,2
    assert f[4] == 3 / 6 and f[5] == 2 / 6 and f[6] == 1 / 6
    assert abs(sum(f[4:]) - 1.0) < 1e-12
    assert pixel_features(b"") == [0.0] * (4 + N_HIST_BINS)


def test_synth_image_decodes_to_formula():
    for d in (0, 3, 768, 771):
        w, h = synth_image_dims(d)
        px = synth_image_pixels(d, w, h)
        payload = encode_ppm(w, h, px)
        assert decode_image(payload) == (w, h, px)
        assert px == bytes((31 * d + 7 * k) % 256 for k in range(w * h * 3))
    # the mod-768 collision class the oracle relies on
    a = synth_image_pixels(0, *synth_image_dims(0))
    b = synth_image_pixels(768, *synth_image_dims(768))
    assert synth_image_dims(0) == synth_image_dims(768)
    assert hashlib.md5(a).hexdigest() == hashlib.md5(b).hexdigest()
    c = synth_image_pixels(3, *synth_image_dims(3))
    assert hashlib.md5(a).hexdigest() != hashlib.md5(c).hexdigest()


# ---------------------------------------------------------------------------
# Property-based round-trips (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        data=st.data(),
    )
    def test_ppm_bmp_roundtrip_property(w, h, data):
        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
        assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)

    @settings(max_examples=50, deadline=None)
    @given(
        st.one_of(
            st.binary(max_size=256),
            st.binary(max_size=64).map(lambda b: b"P6" + b),
            st.binary(max_size=64).map(lambda b: b"BM" + b),
        )
    )
    def test_decode_image_never_crashes_on_garbage(payload):
        """Garbage — including magic-prefixed garbage — either decodes,
        returns None (unrecognized), or raises a typed ValueError;
        never struct.error/IndexError/etc."""
        try:
            out = decode_image(payload)
        except ValueError:
            return  # recognized magic but malformed: loud, typed error
        assert out is None or isinstance(out, tuple)


# ---------------------------------------------------------------------------
# WAV codec + audio features
# ---------------------------------------------------------------------------


def _pcm(samples):
    import struct as _struct

    return _struct.pack("<%dh" % len(samples), *samples)


def test_wav_roundtrip_and_extra_chunks():
    from finmapreduce_spark.operators.codecs import (
        decode_audio,
        decode_wav,
        encode_wav,
        pcm_to_samples,
    )

    samples = [0, 1000, -1000, 32767, -32768, 7, -7]
    payload = encode_wav(8000, _pcm(samples))
    rate, pcm = decode_wav(payload)
    assert rate == 8000 and pcm_to_samples(pcm) == samples
    assert decode_audio(payload) == (8000, pcm)
    assert decode_audio(b"not audio") is None
    # a LIST chunk before data must be skipped (odd size → word pad)
    body = payload[12:]
    extra = b"RIFF" + payload[4:8] + b"WAVE" + b"LIST\x03\x00\x00\x00abc\x00" + body
    assert decode_wav(extra) == (8000, pcm)


def test_wav_malformed_payloads_raise():
    from finmapreduce_spark.operators.codecs import decode_wav, encode_wav

    good = encode_wav(8000, _pcm([1, 2, 3]))
    with pytest.raises(ValueError):
        decode_wav(good[:-3])  # truncated data chunk
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEdata\x04\x00\x00\x00abcd")  # no fmt
    with pytest.raises(ValueError):
        encode_wav(8000, b"odd")


def test_audio_features_values():
    from finmapreduce_spark.operators.multimodal import (
        N_HIST_BINS,
        audio_features,
    )

    s = [0, 100, -100, 200]
    f = audio_features(s)
    assert len(f) == 4 + N_HIST_BINS
    assert f[0] == (sum(s) / 4) / 32768.0
    import math

    assert f[1] == math.sqrt(sum(x * x for x in s) / 4) / 32768.0
    # sign pattern (>=0): + + - + → 2 crossings over 3 transitions
    assert f[2] == 2 / 3
    assert f[3] == 200 / 32768.0
    assert abs(sum(f[4:]) - 1.0) < 1e-12
    assert audio_features([]) == [0.0] * (4 + N_HIST_BINS)
    # full-scale samples land in the outer bins
    f2 = audio_features([-32768, 32767])
    assert f2[4] == 0.5 and f2[15] == 0.5


def test_synth_audio_decodes_to_formula():
    from finmapreduce_spark.operators.codecs import decode_wav, pcm_to_samples
    from finmapreduce_spark.operators.multimodal import (
        AUDIO_RATE,
        _synth_wav_fn,
        synth_audio_samples,
    )
    import pandas as pd

    for d in (1, 4, 12289):
        payload = _synth_wav_fn(pd.Series([d]))[0]
        rate, pcm = decode_wav(payload)
        assert rate == AUDIO_RATE
        assert pcm_to_samples(pcm) == synth_audio_samples(d)
    # the mod-12288 coincidence class the oracle relies on
    assert synth_audio_samples(1) == synth_audio_samples(1 + 12288)
    assert synth_audio_samples(1) != synth_audio_samples(4)


# ---------------------------------------------------------------------------
# Y4M video codec + frame seek
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_and_random_access():
    from finmapreduce_spark.operators.codecs import (
        decode_y4m,
        decode_y4m_frame,
        encode_y4m,
        sniff,
        y4m_frame_count,
    )

    frames = [bytes((f * 7 + k) % 256 for k in range(3 * 4 * 3)) for f in range(5)]
    p = encode_y4m(4, 3, frames)
    assert sniff(p) == "y4m"
    assert decode_y4m(p) == (4, 3, frames)
    assert y4m_frame_count(p) == 5
    # O(1) seek hits the same bytes as the full decode
    for i in (0, 2, 4):
        assert decode_y4m_frame(p, i) == frames[i]
    with pytest.raises(ValueError):
        decode_y4m_frame(p, 5)
    with pytest.raises(ValueError):
        decode_y4m(p[:-2])  # truncated frame record
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H3 F25:1 Ip A0:0 C420\nFRAME\n")  # colorspace


def test_synth_video_decodes_to_formula():
    import pandas as pd

    from finmapreduce_spark.operators.codecs import decode_y4m
    from finmapreduce_spark.operators.multimodal import (
        _synth_y4m_fn,
        synth_video_dims,
        synth_video_frame,
    )

    for d in (2, 5, 770):
        payload = _synth_y4m_fn(pd.Series([d]))[0]
        w, h, frames = decode_y4m(payload)
        assert (w, h, len(frames)) == synth_video_dims(d)
        for f, frame in enumerate(frames):
            assert frame == synth_video_frame(d, f, w, h)
    # the mod-768 coincidence class the oracle relies on
    assert _synth_y4m_fn(pd.Series([2]))[0] == _synth_y4m_fn(pd.Series([770]))[0]
    assert _synth_y4m_fn(pd.Series([2]))[0] != _synth_y4m_fn(pd.Series([5]))[0]


def test_frame_sample_decodes_real_frames(spark):
    from finmapreduce_spark.operators.multimodal import (
        fake_assets_from_documents,
        frame_sample,
        synth_video_frame,
    )
    import hashlib as _hl

    docs = spark.createDataFrame(
        [(2, "video doc"), (5, "another"), (0, "image doc"), (1, "audio doc")],
        "doc_id long, text string",
    )
    rows = frame_sample(fake_assets_from_documents(docs), every_ms=80).collect()
    assert rows and {r["asset_id"] for r in rows} == {2, 5}
    for r in rows:
        d = r["asset_id"]
        w, h = d % 8 + 4, d % 6 + 4
        frame = synth_video_frame(d, r["frame_idx"], w, h)
        assert r["frame_key"] == _hl.md5(frame.hex().encode()).hexdigest()
        assert abs(r["f_mean"] - (sum(frame) / len(frame)) / 255.0) < 1e-12
    # doc 2 has 4 frames / 160ms duration → stamps 0,80 → idx 0,2
    assert sorted(r["frame_idx"] for r in rows if r["asset_id"] == 2) == [0, 2]


def test_resize_images_nearest_neighbor_exact(spark):
    """The thumbnail must be the exact nearest-neighbor index-select
    (source pixel (ty*h)//8, (tx*w)//8) of the decoded pixels —
    checked byte-for-byte against a straight Python reconstruction
    for several dims, including upscaling (src smaller than 8)."""
    import numpy as np

    from finmapreduce_spark.operators.multimodal import (
        fake_assets_from_documents,
        resize_images,
        synth_image_dims,
        synth_image_pixels,
    )

    docs = spark.createDataFrame(
        [(d, "x" * 40) for d in (0, 3, 6, 9, 12)], "doc_id long, text string"
    )
    rows = {
        r["asset_id"]: r
        for r in resize_images(fake_assets_from_documents(docs)).collect()
    }
    assert set(rows) == {0, 3, 6, 9, 12}
    for d, r in rows.items():
        w, h = synth_image_dims(d)
        assert (r["src_w"], r["src_h"]) == (w, h)
        arr = np.frombuffer(
            synth_image_pixels(d, w, h), dtype=np.uint8
        ).reshape(h, w, 3)
        expect = arr[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8, :]
        assert bytes(r["thumb"]) == expect.tobytes()
        flat = expect.reshape(-1).astype(np.int64)
        assert r["thumb_checksum"] == int(((np.arange(192) + 1) * flat).sum())


def test_decode_falls_back_on_magic_coincidence(spark):
    """A payload whose first bytes coincide with a container magic but
    isn't a valid container ('BM...' text, truncated PPM) must take
    the md5-double path, not crash the decode stage."""
    from finmapreduce_spark.operators.multimodal import decode_and_featurize

    rows = [
        (1, "image", b"BMW annual report, not a bitmap"),
        (2, "image", b"P6\n999"),  # truncated PPM header
        (3, "audio", b"RIFFxxxx"),  # truncated WAV
        (4, "video", b"YUV4MPEG2 W"),  # truncated Y4M header
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, kind string, payload binary"
    )
    out = decode_and_featurize(assets).collect()
    assert len(out) == 4
    assert all(len(r["feature"]) <= 16 and r["decoded_md5"] for r in out)
