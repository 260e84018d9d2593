"""Pure-stdlib image codecs: PPM (P6) and BMP (24-bit uncompressed).

These make the multimodal decode stage REAL without any third-party
dependency: a payload whose magic bytes identify a supported container
is decoded to raw RGB pixels; everything else falls back to the
documented md5 test double (operators/multimodal.py).

Both formats are trivially reversible (raw pixel dumps plus a fixed
header), so encode/decode round-trips exactly — which is what lets
the DuckDB oracle reconstruct the decoded features of a synthesized
image from the same deterministic pixel formula the synthesizer used.

Reference parity note: the reference ingests PDFs/markdown only
(src/utils/document_processing.py); image decode is part of this
repo's training-data-pipeline extension surface, not a reference port.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# PPM (P6, binary, maxval 255)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Raw RGB bytes (len == w*h*3) → binary P6 PPM."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}x{height}x3 = {width * height * 3}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Binary P6 PPM → (width, height, raw RGB bytes).

    Supports the common single-whitespace header layout plus comment
    lines; maxval must be 255 (8-bit channels).
    """
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # Tokenize the header: P6, width, height, maxval — whitespace
    # separated, '#' comments run to end-of-line. The pixel block
    # starts exactly one whitespace byte after maxval.
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = width * height * 3
    rgb = payload[pos : pos + n]
    if len(rgb) != n:
        raise ValueError(f"truncated PPM pixel block: {len(rgb)} < {n}")
    return width, height, rgb


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24 bpp, BI_RGB i.e. uncompressed)
# ---------------------------------------------------------------------------

_BMP_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, size, res1, res2, offset
_BMP_INFO_HEADER = struct.Struct("<IiiHHIIiiII")


def _bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Raw RGB bytes (top-down row order) → 24-bit BI_RGB BMP.

    BMP stores rows bottom-up in BGR order; this writer performs both
    conversions so decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb).
    """
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length mismatch")
    stride = _bmp_row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]  # RGB → BGR
        rows.append(bytes(bgr) + pad)
    pixels = b"".join(rows)
    offset = _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size
    info = _BMP_INFO_HEADER.pack(
        _BMP_INFO_HEADER.size, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    head = _BMP_FILE_HEADER.pack(b"BM", offset + len(pixels), 0, 0, offset)
    return head + info + pixels


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """24-bit BI_RGB BMP → (width, height, raw RGB bytes, top-down)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    if len(payload) < _BMP_FILE_HEADER.size + _BMP_INFO_HEADER.size:
        raise ValueError("truncated BMP header")
    _, _, _, _, offset = _BMP_FILE_HEADER.unpack_from(payload, 0)
    (hsize, width, height, _planes, bpp, compression, *_rest) = (
        _BMP_INFO_HEADER.unpack_from(payload, _BMP_FILE_HEADER.size)
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = _bmp_row_stride(width)
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = payload[offset + src_y * stride : offset + src_y * stride + width * 3]
        if len(row) != width * 3:
            raise ValueError("truncated BMP pixel block")
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]  # BGR → RGB
        out[y * width * 3 : (y + 1) * width * 3] = bgr
    return width, abs(height), bytes(out)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def sniff(payload: bytes) -> str | None:
    """Container kind from magic bytes, or None if unrecognized."""
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"YUV4MPEG2"):
        return "y4m"
    return None


def decode_image(payload: bytes) -> tuple[int, int, bytes] | None:
    """Decode any supported image container; None when unrecognized
    (or an audio container — see decode_audio)."""
    kind = sniff(payload or b"")
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    return None


def decode_audio(payload: bytes) -> tuple[int, bytes] | None:
    """Decode any supported audio container → (rate, pcm bytes);
    None when unrecognized (caller falls back to the md5 double)."""
    if sniff(payload or b"") == "wav":
        return decode_wav(payload)
    return None


# ---------------------------------------------------------------------------
# WAV (RIFF, 16-bit mono PCM little-endian)
# ---------------------------------------------------------------------------

_WAV_HEADER = struct.Struct("<4sI4s4sIHHIIHH4sI")


def encode_wav(sample_rate: int, pcm: bytes) -> bytes:
    """16-bit mono PCM bytes (little-endian, len even) → RIFF WAV."""
    if len(pcm) % 2:
        raise ValueError("PCM byte length must be even (16-bit samples)")
    header = _WAV_HEADER.pack(
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return header + pcm


def decode_wav(payload: bytes) -> tuple[int, bytes]:
    """RIFF WAV → (sample_rate, raw 16-bit mono PCM bytes).

    Walks the chunk list (tolerates extra chunks like LIST/fact before
    data); requires PCM format 1, mono, 16-bit.
    """
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={fmt} channels={channels} bits={bits}"
                )
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt")
            if len(body) != size:
                raise ValueError("truncated WAV data chunk")
            return rate, body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


def pcm_to_samples(pcm: bytes) -> list[int]:
    """Little-endian 16-bit PCM bytes → signed ints in [-32768, 32767]."""
    return list(struct.unpack("<%dh" % (len(pcm) // 2), pcm))


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2, uncompressed C444 frames) — video container with
# O(1) frame seek: fixed header + fixed-size FRAME records.
# ---------------------------------------------------------------------------

_Y4M_FRAME_MARK = b"FRAME\n"


def encode_y4m(width: int, height: int, frames: list[bytes], fps: int = 25) -> bytes:
    """Raw C444 frames (each len == 3*w*h: Y,U,V planes) → YUV4MPEG2."""
    fsize = 3 * width * height
    for f in frames:
        if len(f) != fsize:
            raise ValueError(f"frame length {len(f)} != 3*{width}*{height}")
    header = b"YUV4MPEG2 W%d H%d F%d:1 Ip A0:0 C444\n" % (width, height, fps)
    return header + b"".join(_Y4M_FRAME_MARK + f for f in frames)


def _y4m_params(payload: bytes) -> tuple[int, int, int, int]:
    """→ (width, height, fps, header_end_offset)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    end = payload.find(b"\n")
    if end < 0:
        raise ValueError("truncated Y4M header")
    w = h = fps = None
    for tok in payload[10:end].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"F"):
            fps = int(tok[1:].split(b":")[0])
        elif tok.startswith(b"C") and tok != b"C444":
            raise ValueError(f"unsupported Y4M colorspace {tok!r}")
    if not (w and h and fps):
        raise ValueError("Y4M header missing W/H/F")
    return w, h, fps, end + 1


def y4m_frame_count(payload: bytes) -> int:
    w, h, _fps, off = _y4m_params(payload)
    rec = len(_Y4M_FRAME_MARK) + 3 * w * h
    body = len(payload) - off
    if body % rec:
        raise ValueError("truncated Y4M frame record")
    return body // rec


def decode_y4m_frame(payload: bytes, idx: int) -> bytes:
    """O(1) random-access decode of frame ``idx`` — seek straight to
    the fixed-size record; no full-container decode. This is what
    makes distributed frame-SAMPLING cheap: each task touches only
    the bytes of the frames it samples."""
    w, h, _fps, off = _y4m_params(payload)
    fsize = 3 * w * h
    rec = len(_Y4M_FRAME_MARK) + fsize
    n = (len(payload) - off) // rec
    if not 0 <= idx < n:
        raise ValueError(f"frame {idx} out of range (n={n})")
    start = off + idx * rec
    if payload[start : start + len(_Y4M_FRAME_MARK)] != _Y4M_FRAME_MARK:
        raise ValueError("misaligned Y4M frame record")
    return payload[start + len(_Y4M_FRAME_MARK) : start + rec]


def decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    w, h, _fps, _off = _y4m_params(payload)
    return w, h, [decode_y4m_frame(payload, i) for i in range(y4m_frame_count(payload))]
