"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, decoded inside Arrow batches.

Real decoders, no external libraries needed:

- uncompressed 24-bit BMP — hand-parsed header + numpy pixel stats;
- PCM WAV — stdlib ``wave`` + integer RMS;
- PNG (8-bit RGB) — FULL decode with stdlib ``zlib``: chunk walk, IDAT
  inflate, all five scanline de-filters, numpy pixel stats; other PNG
  color types still yield real IHDR width/height (header-level);
- JPEG (baseline sequential, T.81) — FULL decode: DQT/DHT/SOF0 parse,
  Huffman entropy decode, dequantize, float64 IDCT, chroma upsampling
  (sampling factors 1-2), JFIF YCbCr→RGB, numpy pixel stats; outside the
  baseline envelope (progressive, arithmetic) the SOFn marker walk still
  yields real width/height (header-level);
- MP4/ISO-BMFF — header-level: the box-tree walk yields real track
  width/height (tkhd 16.16 fixed) and duration (mvhd), versions 0 and 1.

The ONLY remaining labeled stub is video FRAME decode (needs a codec —
ffmpeg — which this container lacks); genuinely unrecognized blobs fall
through to the clearly-marked deterministic fake, so a mixed-format
corpus never poisons a batch. The Spark-side plumbing — schema, Arrow
batch shape, mapInPandas signature, one-row-per-row output (no shuffle) —
is shared by all formats.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator, Optional

import numpy as np
import pandas as pd

MEDIA_META_SCHEMA = (
    "url string, media_type string, n_bytes long, sha1 string, "
    "width int, height int, mean_r_milli long, mean_g_milli long, mean_b_milli long, "
    "sample_rate int, n_samples long, rms_milli long, "
    "duration_ms long, fake_width int, fake_height int"
)

_META_COLS = [
    "url", "media_type", "n_bytes", "sha1",
    "width", "height", "mean_r_milli", "mean_g_milli", "mean_b_milli",
    "sample_rate", "n_samples", "rms_milli",
    "duration_ms", "fake_width", "fake_height",
]


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (pixels: HxWx3 uint8, RGB).
    Used by fixtures/tests to synthesize deterministic images."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 14 + 40 + image_size, 0, 0, 14 + 40,
        40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = pixels[y, :, ::-1].tobytes()
        rows.append(bgr + b"\x00" * (row_size - w * 3))
    return header + b"".join(rows)


def decode_bmp(data: bytes) -> Optional[dict]:
    """Real decode of an uncompressed 24-bit BMP: header parse + numpy pixel
    stats. Returns None if the bytes aren't such a BMP. Built on the
    pixel decoder (decode_bmp_pixels) so the two can't drift."""
    px = decode_bmp_pixels(data)
    if px is None:
        return None
    h, w = px.shape[0], px.shape[1]
    rgb = px.astype(np.int64)
    return {
        "width": w,
        "height": h,
        # exact integer milli-means: sums are ints, so both an independent
        # oracle and this decoder land on identical values
        "mean_r_milli": int(rgb[:, :, 0].sum() * 1000 // (w * h)),
        "mean_g_milli": int(rgb[:, :, 1].sum() * 1000 // (w * h)),
        "mean_b_milli": int(rgb[:, :, 2].sum() * 1000 // (w * h)),
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal mono 16-bit PCM WAV writer (samples: int16 array)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _read_wav(data: bytes):
    """Shared PCM-WAV reader core: (sample_rate, int64 samples), or None
    if the bytes aren't a 16-bit PCM WAV. Single-sourced so the stats
    decoder and the sample decoder can't drift."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data), "rb") as f:
            if f.getsampwidth() != 2:
                return None
            sr = f.getframerate()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError):
        return None
    return sr, np.frombuffer(frames, dtype="<i2").astype(np.int64)


def decode_wav(data: bytes) -> Optional[dict]:
    """Real decode of a PCM WAV (stdlib wave): header fields + integer RMS
    over 16-bit samples. Returns None if the bytes aren't a PCM WAV."""
    rd = _read_wav(data)
    if rd is None:
        return None
    sr, samples = rd
    n_samples = samples.size
    # integer RMS in milli-units: floor(sqrt(mean(x^2)) * 1000) computed via
    # integer isqrt so it is exactly reproducible off-Spark
    if n_samples:
        import math

        rms_milli = math.isqrt(int((samples * samples).sum()) * 1_000_000 // n_samples)
    else:
        rms_milli = 0
    return {
        "sample_rate": sr,
        "n_samples": n_samples,
        "rms_milli": rms_milli,
    }


PNG_SIG = b"\x89PNG\r\n\x1a\n"

# pixel-decode work cap shared by the PNG and JPEG paths: decode work is
# bounded by the DECLARED dimensions, never by what the stream holds — a
# crafted header (50000×50000) must not OOM or stall an executor. Dims
# above the cap keep header-level metadata only.
_MAX_DECODE_PIXELS = 16 * 1024 * 1024  # 48 MB of RGB + filter bytes


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG writer (pixels: HxWx3 uint8): IHDR + one
    zlib-compressed IDAT of filter-0 scanlines + IEND, CRCs included.
    Used by fixtures/tests to synthesize deterministic images."""
    import zlib

    h, w, _ = pixels.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_defilter(raw: bytes, w: int, h: int, bpp: int = 3) -> Optional[np.ndarray]:
    """Reverse PNG scanline filtering (spec filters 0-4). Filter-0/2 rows
    are pure numpy; 1/3/4 fall back to the per-byte recurrence the spec
    defines (they're sequential by construction)."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):
            cur = np.zeros(stride, np.int32)
            prev_diag = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:  # Sub
                    v = row[x] + a
                elif f == 3:  # Average
                    v = row[x] + ((a + b) >> 1)
                else:  # Paeth
                    c = prev_diag[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = row[x] + pred
                cur[x] = v & 0xFF
        else:
            return None  # invalid filter byte
        out[y] = cur & 0xFF
    return out.reshape(h, w, bpp)


def _png_parse(data: bytes):
    """Shared PNG chunk-walk core: (width, height, bitdepth, colortype,
    interlace, idat) or None if not a PNG. Single-sourced so the stats
    decoder and the pixel decoder can't drift (the BMP/WAV discipline)."""
    if len(data) < 8 + 25 or not data.startswith(PNG_SIG):
        return None
    pos = 8
    width = height = None
    bitdepth = colortype = interlace = None
    idat = b""
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            break
        if typ == b"IHDR" and ln >= 13:
            width, height, bitdepth, colortype = struct.unpack_from(">IIBB", body)
            interlace = body[12]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if width is None or width <= 0 or height <= 0:
        return None
    return int(width), int(height), bitdepth, colortype, interlace, idat


def decode_png_pixels(data: bytes) -> Optional[np.ndarray]:
    """Pixel-returning PNG decode: HxWx3 uint8 RGB for 8-bit RGB
    non-interlaced PNGs, else None (header-only types have no pixel
    payload to hash). Work bounded by the DECLARED dims
    (_MAX_DECODE_PIXELS) and the inflate capped at the expected byte
    count (zlib-bomb guard), exactly as decode_png."""
    parsed = _png_parse(data)
    if parsed is None:
        return None
    width, height, bitdepth, colortype, interlace, idat = parsed
    if not (
        bitdepth == 8
        and colortype == 2
        and interlace == 0
        and idat
        and width * height <= _MAX_DECODE_PIXELS
    ):
        return None
    import zlib

    expected = height * (width * 3 + 1)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(idat, expected)
        if d.unconsumed_tail or len(raw) < expected:
            return None  # stream longer or shorter than IHDR declares
    except zlib.error:
        return None
    return _png_defilter(raw, width, height)


def decode_png(data: bytes) -> Optional[dict]:
    """Real PNG decode via stdlib zlib: chunk walk → IHDR dims; for 8-bit
    RGB (color type 2, no interlace) additionally inflates IDAT, reverses
    the scanline filters, and computes the exact integer milli-means.
    Other color types return header-level width/height (still real
    metadata — IHDR is authoritative). Returns None if not a PNG.
    Built on _png_parse/decode_png_pixels (one parser)."""
    parsed = _png_parse(data)
    if parsed is None:
        return None
    width, height = parsed[0], parsed[1]
    out = {"width": width, "height": height}
    px = decode_png_pixels(data)
    if px is not None:
        rgb = px.astype(np.int64)
        n = width * height
        out["mean_r_milli"] = int(rgb[:, :, 0].sum() * 1000 // n)
        out["mean_g_milli"] = int(rgb[:, :, 1].sum() * 1000 // n)
        out["mean_b_milli"] = int(rgb[:, :, 2].sum() * 1000 // n)
    return out


# SOFn markers carrying frame dimensions: C0-CF except C4 (DHT), C8 (JPG
# extension), CC (DAC)
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}

# ---------------------------------------------------------------------------
# Baseline sequential JPEG (ITU T.81): real encoder (fixtures) + full decoder
# ---------------------------------------------------------------------------

# zig-zag scan order (T.81 figure 5)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard Huffman table specs from T.81 Annex K.3 (public spec constants):
# (BITS counts per code length 1..16, HUFFVAL symbol list)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: C[u,x] = a(u) cos((2x+1)uπ/16),
    a(0)=sqrt(1/8), a(u>0)=1/2. FDCT: C·B·Cᵀ; IDCT: Cᵀ·F·C (float64)."""
    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(1.0 / 8.0) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_DCT_M = _dct_matrix()


def _huff_codes(bits: list, vals: list) -> dict:
    """T.81 Annex C code assignment: symbol → (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
            # mask emitted high bits or acc grows into a scan-length
            # bignum and every shift turns O(stream)
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per spec
        return bytes(self.buf)


def _magnitude_bits(v: int) -> tuple:
    """(category, appended-bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range color transform, rounded to uint8 — module-level so
    fixture goldens can replay the exact same arithmetic."""
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Inverse JFIF transform, rounded and clamped to uint8."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(pixels: np.ndarray, subsample: bool = False) -> bytes:
    """REAL baseline sequential JPEG encoder (pixels: HxWx3 uint8 RGB):
    JFIF 4:4:4 (or 4:2:0 box-mean chroma with ``subsample=True``),
    all-ones quantization tables (so constant blocks survive the DCT
    round-trip exactly), standard Annex-K Huffman tables, byte-stuffed
    entropy-coded scan. Fixture/test writer — small images only
    (pure-Python Huffman loop)."""
    h, w, _ = pixels.shape
    ycc = rgb_to_ycbcr(pixels).astype(np.float64) - 128.0
    sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c, (chs, cvs) in enumerate(sampling):
        p = ycc[..., c]
        fy, fx = vmax // cvs, hmax // chs
        if fy > 1 or fx > 1:  # box-mean chroma downsample
            py = np.pad(
                p, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge"
            )
            p = py.reshape(py.shape[0] // fy, fy, py.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        th, tw = mcuy * cvs * 8, mcux * chs * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        planes.append(p)

    dc_y = _huff_codes(*_STD_DC_LUMA)
    ac_y = _huff_codes(*_STD_AC_LUMA)
    dc_c = _huff_codes(*_STD_DC_CHROMA)
    ac_c = _huff_codes(*_STD_AC_CHROMA)
    bw = _BitWriter()
    pred = [0, 0, 0]
    inv_zz = _ZIGZAG

    def put_block(block: np.ndarray, c: int) -> None:
        coef = _DCT_M @ block @ _DCT_M.T
        q = np.rint(coef).astype(np.int64).reshape(64)[inv_zz]
        dct, act = (dc_y, ac_y) if c == 0 else (dc_c, ac_c)
        diff = int(q[0]) - pred[c]
        pred[c] = int(q[0])
        cat, bits = _magnitude_bits(diff)
        code, ln = dct[cat]
        bw.put(code, ln)
        if cat:
            bw.put(bits, cat)
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if q[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            cat, bits = _magnitude_bits(v)
            code, ln = act[(run << 4) | cat]
            bw.put(code, ln)
            bw.put(bits, cat)
            run = 0
        if last_nz < 63:
            code, ln = act[0x00]  # EOB
            bw.put(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for c, (chs, cvs) in enumerate(sampling):
                for byy in range(cvs):
                    for bxx in range(chs):
                        y0 = (my * cvs + byy) * 8
                        x0 = (mx * chs + bxx) * 8
                        put_block(planes[c][y0 : y0 + 8, x0 : x0 + 8], c)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    ones = bytes([1] * 64)
    dqt = seg(0xDB, bytes([0]) + ones) + seg(0xDB, bytes([1]) + ones)
    comp_specs = b"".join(
        bytes([cid, (chs << 4) | cvs, 0 if cid == 1 else 1])
        for cid, (chs, cvs) in zip((1, 2, 3), sampling)
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comp_specs)

    def dht(tc_th: int, spec: tuple) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    dhts = (
        dht(0x00, _STD_DC_LUMA)
        + dht(0x10, _STD_AC_LUMA)
        + dht(0x01, _STD_DC_CHROMA)
        + dht(0x11, _STD_AC_CHROMA)
    )
    sos = seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    return (
        b"\xff\xd8" + seg(0xE0, app0) + dqt + sof + dhts + sos + scan + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-coded-segment bit reader with 0xFF00 unstuffing; RSTn
    markers reset the stream (DC predictors are reset by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        """Top up the accumulator to ≥16 bits when the scan has them."""
        d = self.data
        while self.n < 16:
            if self.pos >= len(d):
                return
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(d):
                    return
                nxt = d[self.pos + 1]
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                else:  # restart or real marker: stop feeding bits
                    return
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def skip_rst(self) -> bool:
        """Consume a restart marker at the current byte boundary."""
        self.acc = 0
        self.n = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return True
        return False

    def bits(self, k: int):
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
            if self.n < k:
                return None
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        # mask consumed high bits: without this the accumulator grows into
        # a scan-length bignum and every shift turns O(stream) (measured
        # quadratic blowup on dense scans)
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, table: list):
        """Table-driven Huffman decode: ONE 16-bit-window lookup per
        symbol (vs the per-bit walk a naive decoder does — measured ~8×
        on noise-dense scans)."""
        if self.n < 16:
            self._fill()
        n = self.n
        if n == 0:
            return None
        window = (
            (self.acc >> (n - 16)) & 0xFFFF
            if n >= 16
            else (self.acc << (16 - n)) & 0xFFFF
        )
        sym_ln = table[window]
        if sym_ln is None:
            return None
        sym, ln = sym_ln
        if ln > n:
            return None
        self.n = n - ln
        self.acc &= (1 << self.n) - 1  # see bits(): keep acc bounded
        return sym


def _huff_lookup_table(bits: tuple, vals: tuple) -> list:
    """65536-entry window→(symbol, code_length) lookup, derived from the
    SAME Annex-C assignment as the encoder (_huff_codes — single source of
    truth). Cached per table spec: the Annex-K standard tables recur
    across every image of a crawl, so the fill cost is paid once."""
    tbl: list = [None] * 65536
    for sym, (code, ln) in _huff_codes(list(bits), list(vals)).items():
        base = code << (16 - ln)
        entry = (sym, ln)
        for i in range(base, base + (1 << (16 - ln))):
            tbl[i] = entry
    return tbl


_huff_lookup_cache: dict = {}


def _huff_lookup(bits: list, vals: list) -> list:
    key = (bytes(bits), bytes(vals))
    got = _huff_lookup_cache.get(key)
    if got is None:
        got = _huff_lookup_table(tuple(bits), tuple(vals))
        if len(_huff_lookup_cache) > 64:  # corrupt-DHT flood guard
            _huff_lookup_cache.clear()
        _huff_lookup_cache[key] = got
    return got


# JPEG-specific per-row work budgets, tighter than the shared pixel cap:
# the entropy decode is a pure-Python symbol loop (the sandbox has no
# libjpeg). Measured with the 16-bit lookup tables + batched einsum IDCT:
# ~1 µs per scan byte (512×512 all-coefficient noise, 1 MB scan → 1.0 s;
# 1 MP smooth 4:2:0 → 1.2 s), so the budgets bound one pathological row
# to ~2 s instead of stalling a task (the MAX_SCAN_CHARS principle from
# engine/core.py); images beyond either budget keep header-level
# metadata. On a cluster with image codecs installed the pixel path would
# swap to the native decoder and these budgets would move to
# _MAX_DECODE_PIXELS.
_JPEG_MAX_DECODE_PIXELS = 1024 * 1024
_JPEG_MAX_SCAN_BYTES = 2 * 1024 * 1024


def decode_jpeg(data: bytes) -> Optional[dict]:
    """FULL baseline sequential JPEG decode (T.81): marker walk, DQT/DHT
    parse, table-driven Huffman entropy decode, dequantize, float64 IDCT,
    chroma upsampling for sampling factors in {1,2}, JFIF YCbCr→RGB —
    pure stdlib + numpy, mirroring the PNG path. Returns dims + exact
    integer milli-means. Degrades to header-level width/height (the
    pre-round-5 behavior) for anything outside the baseline-decodable
    envelope — progressive (SOF2), arithmetic coding, >2 sampling
    factors, zero dims, corrupt/truncated segments or scans, or images
    beyond the _JPEG_MAX_DECODE_PIXELS/_JPEG_MAX_SCAN_BYTES work budgets
    — and None when the bytes aren't a JPEG at all. The degrade contract
    is enforced structurally: the pixel path runs inside a guard that
    maps ANY malformed-input error to the header result, so a corrupt
    crawl row can never fail a Spark task (pinned in test_round5)."""
    hdr = decode_jpeg_header(data)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    try:
        out = _decode_jpeg_pixels(data, hdr)
    except Exception:  # malformed segment shapes beyond the explicit guards
        return hdr
    return out


def _decode_jpeg_pixels(data: bytes, hdr: Optional[dict]) -> Optional[dict]:
    qt: dict = {}
    huff: dict = {}
    frame = None
    ri = 0  # restart interval
    pos = 2
    scan_info = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return hdr
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + ln]
        if ln < 2 or len(body) < ln - 2:
            return hdr
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                n = 64 * (2 if pq else 1)
                if i + 1 + n > len(body):
                    return hdr
                raw = body[i + 1 : i + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                qt[tq] = tbl
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) < nv:
                    return hdr
                huff[tc_th] = _huff_lookup(bits, vals)
                i += 17 + nv
        elif marker in _JPEG_SOF_MARKERS:
            if marker != 0xC0 and marker != 0xC1:  # baseline/ext. sequential only
                return hdr
            if len(body) < 6:
                return hdr
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body)
            if prec != 8 or nc not in (1, 3) or len(body) < 6 + 3 * nc:
                return hdr
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fw, fh, comps)
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return hdr
            ri = struct.unpack_from(">H", body)[0]
        elif marker == 0xDA:  # SOS
            if not body:
                return hdr
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                return hdr
            sel = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 0x0F)
            scan_info = (sel, pos + 2 + ln)
            break
        pos += 2 + ln
    if frame is None or scan_info is None:
        return hdr
    fw, fh, comps = frame
    if fw <= 0 or fh <= 0 or fw * fh > _JPEG_MAX_DECODE_PIXELS:
        return hdr
    if len(data) - scan_info[1] > _JPEG_MAX_SCAN_BYTES:
        return hdr
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        return hdr
    sel, scan_pos = scan_info
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = []
    for cid, ch, cv, tq in comps:
        if tq not in qt or cid not in sel:
            return hdr
        td, ta = sel[cid]
        if td not in huff or (0x10 | ta) not in huff:
            return hdr
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64))

    # entropy decode: the hot loop touches ONLY Python ints and lists
    # (numpy per-element setitem costs ~100 ns each and the per-block 8×8
    # matmuls are overhead-dominated — moving both out of the loop and
    # batching the IDCT as one einsum per component measured ~6× on a
    # dense noise scan); dequant + IDCT + placement happen vectorized
    # afterwards
    br = _BitReader(data, scan_pos)
    pred = [0] * len(comps)
    blocks_zz: list = [[] for _ in comps]  # (y0, x0, zz-list) per component
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                if not br.skip_rst():
                    return hdr
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = sel[cid]
                dct_tbl, act_tbl = huff[td], huff[0x10 | ta]
                for byy in range(cv):
                    for bxx in range(ch):
                        zz = [0] * 64
                        s = br.read_symbol(dct_tbl)
                        if s is None:
                            return hdr
                        if s:
                            vbits = br.bits(s)
                            if vbits is None:
                                return hdr
                            pred[ci] += (
                                vbits
                                if vbits >= (1 << (s - 1))
                                else vbits - (1 << s) + 1
                            )
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(act_tbl)
                            if rs is None:
                                return hdr
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return hdr
                            vbits = br.bits(s)
                            if vbits is None:
                                return hdr
                            zz[k] = (
                                vbits
                                if vbits >= (1 << (s - 1))
                                else vbits - (1 << s) + 1
                            )
                            k += 1
                        blocks_zz[ci].append(
                            ((my * cv + byy) * 8, (mx * ch + bxx) * 8, zz)
                        )
    # batched dequant + IDCT per component (DQT bytes are zigzag-ordered,
    # matching the collected coefficient order)
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        entries = blocks_zz[ci]
        arr = np.array([e[2] for e in entries], dtype=np.float64)
        arr *= qt[tq].astype(np.float64)[None, :]
        coef = np.zeros((len(entries), 64))
        coef[:, _ZIGZAG] = arr
        spatial = np.einsum(
            "ub,nbc,cv->nuv", _DCT_M.T, coef.reshape(-1, 8, 8), _DCT_M
        )
        plane = planes[ci]
        for (y0, x0, _), blk in zip(entries, spatial):
            plane[y0 : y0 + 8, x0 : x0 + 8] = blk
    # upsample to full resolution, crop, level-shift
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:fh, :fw] + 128.0)
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.int64)
        mean = int(gray.sum() * 1000 // (fw * fh))
        return {
            "width": int(fw),
            "height": int(fh),
            "mean_r_milli": mean,
            "mean_g_milli": mean,
            "mean_b_milli": mean,
        }
    ycc = np.clip(np.rint(np.stack(full, axis=-1)), 0, 255).astype(np.uint8)
    rgb = ycbcr_to_rgb(ycc).astype(np.int64)
    n = fw * fh
    return {
        "width": int(fw),
        "height": int(fh),
        "mean_r_milli": int(rgb[:, :, 0].sum() * 1000 // n),
        "mean_g_milli": int(rgb[:, :, 1].sum() * 1000 // n),
        "mean_b_milli": int(rgb[:, :, 2].sum() * 1000 // n),
    }


def encode_jpeg_header(w: int, h: int, seed: int = 0) -> bytes:
    """Minimal structurally-valid JPEG prefix (SOI + APP0/JFIF + DQT +
    SOF0 + EOI) carrying real frame dimensions — enough for header-level
    metadata extraction; no entropy-coded scan data. Fixture writer."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0]) + bytes((seed * 7 + i * 13) % 255 + 1 for i in range(64))
    sof = (
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"".join(
        [
            b"\xff\xd8",
            b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0,
            b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt,
            b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof,
            b"\xff\xd9",
        ]
    )


def decode_jpeg_header(data: bytes) -> Optional[dict]:
    """Header-level JPEG decode: walk the marker segments to the first
    SOFn frame header and return its real width/height (stdlib struct —
    no PIL needed; a crawl's media is mostly JPEG/PNG, so this closes the
    dimensions gap the full-decode stub left). Returns None if the bytes
    are not a marker-valid JPEG or no SOF appears before the scan."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            return None
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone markers
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        if ln < 2 or pos + 2 + ln > len(data):
            return None
        if marker in _JPEG_SOF_MARKERS and ln >= 9:
            _prec, h, w = struct.unpack_from(">BHH", data, pos + 4)
            if w <= 0 or h <= 0:
                return None
            return {"width": int(w), "height": int(h)}
        pos += 2 + ln
    return None


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF) — header-level metadata via the box structure; FRAME decode
# genuinely needs a video codec (ffmpeg) and stays out of scope
# ---------------------------------------------------------------------------


def encode_mp4_header(
    w: int, h: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Minimal structurally-valid ISO BMFF prefix: ftyp + moov(mvhd +
    trak(tkhd)) carrying real dimensions (16.16 fixed) and duration —
    enough for header-level metadata extraction; no mdat/samples.
    Fixture writer."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 0x000007)  # version 0 + enabled/in-movie flags
        + struct.pack(">IIIII", 0, 0, 1, 0, dur)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, alt_group, volume, reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


def decode_mp4_header(data: bytes) -> Optional[dict]:
    """Header-level MP4/ISO-BMFF decode: walk the box tree to the first
    video-sized tkhd (16.16 fixed width/height) and the mvhd
    timescale/duration (both version 0 and 1 layouts). Pure stdlib
    struct — the analogue of the JPEG SOFn walk; FRAME decode needs a
    codec and is out of scope by design (the one remaining labeled
    stub). Returns None when the bytes aren't an ISO BMFF container.

    Container sniff: ISO 14496-12 only RECOMMENDS ftyp first — QuickTime
    files legally open with 'wide'/'skip'/'free' padding or even
    moov/mdat — so the check accepts any known top-level box type at
    offset 0 and then requires an ftyp or moov among the first few
    boxes (a fixed-type-at-fixed-offset check misclassified those files
    as 'unknown' and handed them stub metadata)."""
    _TOP_BOXES = {b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide", b"pnot"}
    if len(data) < 12 or data[4:8] not in _TOP_BOXES:
        return None
    if data[4:8] not in (b"ftyp", b"moov"):
        # scan up to 4 top-level boxes for the identifying ftyp/moov
        pos, seen = 0, False
        for _ in range(4):
            if pos + 8 > len(data):
                break
            size, typ = struct.unpack_from(">I4s", data, pos)
            if typ in (b"ftyp", b"moov"):
                seen = True
                break
            if typ not in _TOP_BOXES or size < 8:
                break
            pos += size
        if not seen:
            return None
    out: dict = {}

    def walk(lo: int, hi: int, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi and depth < 8:
            size, typ = struct.unpack_from(">I4s", data, pos)
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > hi:
                    return
                size = struct.unpack_from(">Q", data, pos + 8)[0]
                body = pos + 16
            elif size == 0:
                size = hi - pos
            if size < 8 or pos + size > hi:
                return
            end = pos + size
            if typ in (b"moov", b"trak"):
                walk(body, end, depth + 1)
            elif typ == b"mvhd" and body + 4 <= end:
                v = data[body]
                if v == 0 and body + 20 <= end:
                    ts, dur = struct.unpack_from(">II", data, body + 12)
                elif v == 1 and body + 32 <= end:
                    ts = struct.unpack_from(">I", data, body + 20)[0]
                    dur = struct.unpack_from(">Q", data, body + 24)[0]
                else:
                    ts = 0
                if ts:
                    out["duration_ms"] = int(dur * 1000 // ts)
            elif typ == b"tkhd" and body + 4 <= end and "width" not in out:
                v = data[body]
                # width offset past version/flags(4), times(v0: 4+4 /
                # v1: 8+8), track_id(4), reserved(4), duration(v0: 4 /
                # v1: 8), reserved(8), layer/alt/volume/reserved(8),
                # matrix(36) = 76 (v0) / 88 (v1)
                off = body + (88 if v == 1 else 76)
                if off + 8 <= end:
                    wfx, hfx = struct.unpack_from(">II", data, off)
                    w, h = wfx >> 16, hfx >> 16
                    if w > 0 and h > 0:  # audio/hint tracks carry 0×0
                        out["width"], out["height"] = int(w), int(h)
            pos = end

    walk(0, len(data), 0)
    return out


def decode_image_stub(data: bytes) -> dict:
    """DETERMINISTIC FAKE decode for formats this container cannot decode
    (MP4/video need ffmpeg): stable pseudo-metadata from a content hash,
    clearly labeled via media_type='unknown'."""
    h = hashlib.sha1(data).digest()
    return {
        "fake_width": 64 + h[0] % 192,
        "fake_height": 64 + h[1] % 192,
    }


def classify_and_decode(data: bytes) -> dict:
    """Dispatch on magic bytes → typed metadata dict (+ media_type)."""
    out: dict = {c: None for c in _META_COLS if c not in ("url", "n_bytes", "sha1")}
    bmp = decode_bmp(data)
    if bmp is not None:
        out.update(bmp)
        out["media_type"] = "image/bmp"
        return out
    wav = decode_wav(data)
    if wav is not None:
        out.update(wav)
        out["media_type"] = "audio/wav"
        return out
    png = decode_png(data)
    if png is not None:
        out.update(png)
        out["media_type"] = "image/png"
        return out
    jpg = decode_jpeg(data)
    if jpg is not None:
        out.update(jpg)
        out["media_type"] = "image/jpeg"
        return out
    mp4 = decode_mp4_header(data)
    # a bare ISO-BMFF signature with NO extractable moov metadata (e.g.
    # ftyp followed by a truncated/absent moov) does NOT earn the type —
    # the JPEG path likewise requires at least header dims before
    # claiming image/jpeg; such bytes fall through to the labeled stub
    if mp4:
        out.update(mp4)
        out["media_type"] = "video/mp4"
        return out
    out.update(decode_image_stub(data))
    out["media_type"] = "unknown"
    return out


def extract_media_meta(df, binary_col: str = "html", url_col: str = "url"):
    """mapInPandas over the binary column: typed decode metadata.

    Batch shape: the binary column arrives as Arrow LargeBinary → pandas
    bytes objects; output is one row per input row (no fan-out), so the
    stage pipelines with the scan and never shuffles. At crawl scale the
    binary column is the bulk of the table — select it ONLY into this stage
    (column pruning keeps it out of every other operator).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                meta = classify_and_decode(data)
                meta["url"] = url
                meta["n_bytes"] = len(data)
                meta["sha1"] = hashlib.sha1(data).hexdigest()
                rows.append(meta)
            out = pd.DataFrame(rows, columns=_META_COLS)
            for c in ("width", "height", "sample_rate", "fake_width", "fake_height"):
                out[c] = out[c].astype("Int32")
            for c in ("mean_r_milli", "mean_g_milli", "mean_b_milli",
                      "n_samples", "rms_milli", "duration_ms"):
                out[c] = out[c].astype("Int64")
            yield out

    return df.select(url_col, binary_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + banded hamming near-dup pairs
# ---------------------------------------------------------------------------


def decode_bmp_pixels(data: bytes) -> Optional[np.ndarray]:
    """Pixel-returning sibling of decode_bmp: HxWx3 uint8 RGB, or None
    if the bytes aren't an uncompressed 24-bit BMP."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(data) < pixel_offset + row_size * h:
        return None
    raw = np.frombuffer(
        data, dtype=np.uint8, count=row_size * h, offset=pixel_offset
    )
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def decode_image_pixels(data: bytes) -> Optional[np.ndarray]:
    """Format-sniffing pixel decode for the perceptual-hash path: 24-bit
    BMP or 8-bit-RGB PNG by magic bytes (both LOSSLESS, so a BMP and a
    PNG of the same pixels hash identically — cross-format near-dups
    come for free). Lossy formats stay out of this path: a JPEG
    round-trip changes pixels, so its hash would depend on decoder
    details rather than content geometry."""
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:8] == PNG_SIG:
        return decode_png_pixels(data)
    return None


def image_dhash(pixels: np.ndarray) -> int:
    """64-bit difference hash of an HxWx3 uint8 RGB image — the classic
    perceptual near-dup fingerprint (gradient signs survive re-encode /
    brightness shifts; cryptographic hashes don't). EXACT integer
    pipeline so Spark-side UDF, golden replay, and any other engine
    land on the identical hash:

      gray  = (299 R + 587 G + 114 B) DIV 1000        (integer luma)
      grid  = 8 rows x 9 cols of block means, block boundaries at
              (k * dim) DIV parts, mean = sum DIV count (floor)
      bit(y, x) = grid[y][x+1] > grid[y][x]           (64 bits, MSB
              first in row-major order)

    Returned as a SIGNED 64-bit int (wrapped) so it stores in a Spark
    LongType column unchanged. Images smaller than 9x8 hash their
    nearest-block means the same way (boundaries collapse; still
    deterministic)."""
    g = (
        pixels[:, :, 0].astype(np.int64) * 299
        + pixels[:, :, 1].astype(np.int64) * 587
        + pixels[:, :, 2].astype(np.int64) * 114
    ) // 1000
    h, w = g.shape
    rows = [(k * h) // 8 for k in range(9)]
    cols = [(k * w) // 9 for k in range(10)]
    grid = np.zeros((8, 9), dtype=np.int64)
    for y in range(8):
        r0, r1 = rows[y], max(rows[y + 1], rows[y] + 1)
        for x in range(9):
            c0, c1 = cols[x], max(cols[x + 1], cols[x] + 1)
            block = g[min(r0, h - 1):min(r1, h), min(c0, w - 1):min(c1, w)]
            grid[y, x] = int(block.sum()) // max(block.size, 1)
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | int(grid[y, x + 1] > grid[y, x])
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def with_image_dhash(
    df, binary_col: str = "media", url_col: str = "url"
):
    """(url, width, height, dhash) for every decodable lossless image
    row (24-bit BMP or 8-bit-RGB PNG — decode_image_pixels); other rows
    get NULLs (type plumbing intact, the multimodal convention). Arrow-batched mapInPandas — the decode+hash kernel is
    pure numpy per batch, no JVM round-trip per row; at crawl scale
    this is the standard binary-column scan shape (predicate pushdown
    keeps non-image rows out upstream when the caller filters)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            urls, ws, hs, hashes = [], [], [], []
            for u, blob in zip(pdf[url_col], pdf[binary_col]):
                px = decode_image_pixels(bytes(blob)) if blob is not None else None
                urls.append(u)
                if px is None:
                    ws.append(None); hs.append(None); hashes.append(None)
                else:
                    hh, ww = px.shape[0], px.shape[1]
                    ws.append(ww); hs.append(hh)
                    hashes.append(image_dhash(px))
            # NULLABLE integer arrays, not plain lists: a batch holding
            # one None would otherwise go object->float64 on the Arrow
            # conversion and ROUND the 64-bit hash's low bits away
            # (>2^53; observed off-by-<32 corruption on exactly the
            # batches containing a non-BMP row).
            yield pd.DataFrame(
                {
                    "url": urls,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "dhash": pd.array(hashes, dtype="Int64"),
                }
            )

    # select url+binary FIRST: Spark can't prune columns below
    # mapInPandas, so a wide caller frame would Arrow-serialize every
    # column to the Python workers for nothing (extract_media_meta's
    # convention).
    return df.select(url_col, binary_col).mapInPandas(
        kernel, schema="url string, width int, height int, dhash long"
    )


def image_near_dup_pairs(
    hashed,
    max_hamming: int = 6,
    url_col: str = "url",
    hash_col: str = "dhash",
    checkpoint: bool = True,
):
    """(url_a, url_b, hamming): image pairs whose dHash differs in at
    most ``max_hamming`` of 64 bits — simhash_near_dups' banded-LSH
    shape applied to the image fingerprint. The 64-bit hash splits into
    4 x 16-bit bands; by pigeonhole any pair within hamming distance 3
    shares a band EXACTLY, and distance <= max_hamming pairs share one
    with high probability (the standard recall trade, documented as in
    the text simhash op) — candidates come from 4 band equi-joins
    (map-side band extraction, hash-partitioned join, never all-pairs),
    then the exact popcount(xor) verify runs on candidates only.

    NULL hashes (undecodable rows) are excluded; pairs emit once
    (url_a < url_b, distinct across bands)."""
    from pyspark.sql import functions as F

    d = hashed.where(F.col(hash_col).isNotNull()).select(
        F.col(url_col).alias("u"), F.col(hash_col).alias("h")
    )
    # The hash projection feeds BOTH self-join sides — without a
    # persist the upstream decode kernel runs twice (ppjoin's
    # rationale; the hash table is 1 row x 16 bytes per image, tiny).
    # checkpoint=False keeps the lazy plan (plan dumps/tests) at the
    # cost of the double decode.
    if checkpoint:
        d.persist()
    bands = d.select(
        "u",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(h >> {b * 16}) & 65535").alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("u", "h", "bk.band", "bk.key")
    a = bands.select(
        F.col("u").alias("url_a"), F.col("h").alias("ha"), "band", "key"
    )
    b = bands.select(
        F.col("u").alias("url_b"), F.col("h").alias("hb"), "band", "key"
    )
    try:
        out = (
            a.join(b, ["band", "key"])
            .where(F.col("url_a") < F.col("url_b"))
            .select("url_a", "url_b", "ha", "hb")
            .distinct()
            .withColumn(
                "hamming",
                F.expr("CAST(bit_count(ha ^ hb) AS LONG)"),
            )
            .where(F.col("hamming") <= max_hamming)
            .select("url_a", "url_b", "hamming")
        )
        if checkpoint:
            # pair-grain output, bounded — materialize so the persisted
            # hash projection releases now
            out = out.localCheckpoint(eager=True)
    finally:
        if checkpoint:
            d.unpersist()
    return out


def py_image_near_dup_pairs(hashes: list, max_hamming: int = 6) -> list:
    """Golden replay over (url, dhash) pairs: same banding, same
    popcount — sorted (url_a, url_b, hamming). Brute-force across the
    band-candidate set (identical recall contract to the Spark op)."""
    by_band: dict = {}
    items = [(u, h) for u, h in hashes if h is not None]
    for u, h in items:
        uh = h & ((1 << 64) - 1)
        for bnd in range(4):
            key = (uh >> (bnd * 16)) & 0xFFFF
            by_band.setdefault((bnd, key), []).append((u, h))
    seen = set()
    out = []
    for members in by_band.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ua, ha = members[i]
                ub, hb = members[j]
                if ua == ub or (ua, ub) in seen:
                    continue
                seen.add((ua, ub))
                d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    out.append((ua, ub, d))
    return sorted(out)


# ---------------------------------------------------------------------------
# Audio fingerprinting (frame-energy delta signs) + exact match groups
# ---------------------------------------------------------------------------


def decode_wav_samples(data: bytes) -> Optional[np.ndarray]:
    """Sample-returning sibling of decode_wav (same _read_wav core)."""
    rd = _read_wav(data)
    return None if rd is None else rd[1]


AUDIO_FRAME = 256
AUDIO_FP_BITS = 63  # fits a signed long without wrap handling


def audio_fingerprint(samples: np.ndarray) -> Optional[int]:
    """63-bit audio fingerprint: per-frame energy (sum of squares over
    ``AUDIO_FRAME``-sample frames, exact integers), then the SIGN of
    consecutive-frame energy deltas — the shape of published audio
    fingerprints (Shazam-family spectral-delta signs), reduced to the
    time-energy envelope so every step is integer-exact and
    engine-replayable (an FFT would be float and rounding-sensitive).
    Envelope-delta signs survive uniform gain EXACTLY when the gain is
    an integer multiplier (energy scales by g^2 > 0; sign(a-b)
    unchanged) — the analog of dHash's brightness invariance, pinned by
    test. Clips shorter than AUDIO_FP_BITS+1 full frames zero-pad their
    missing trailing frames (energy 0). Returns None for empty audio."""
    if samples.size == 0:
        return None
    n_frames = AUDIO_FP_BITS + 1
    e = np.zeros(n_frames, dtype=object)
    for k in range(n_frames):
        seg = samples[k * AUDIO_FRAME:(k + 1) * AUDIO_FRAME]
        e[k] = int((seg * seg).sum()) if seg.size else 0
    bits = 0
    for k in range(AUDIO_FP_BITS):
        bits = (bits << 1) | int(e[k + 1] > e[k])
    return bits


def with_audio_fingerprint(
    df, binary_col: str = "media", url_col: str = "url"
):
    """(url, n_samples, fingerprint) for every decodable PCM WAV row;
    non-WAV rows keep NULL plumbing. Same Arrow-batched mapInPandas
    shape (and the same NULLABLE-Int64 output discipline — a None in a
    batch must not send the 63-bit fingerprint through float64) as
    with_image_dhash."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            urls, ns, fps = [], [], []
            for u, blob in zip(pdf[url_col], pdf[binary_col]):
                s = decode_wav_samples(bytes(blob)) if blob is not None else None
                urls.append(u)
                if s is None:
                    ns.append(None); fps.append(None)
                else:
                    ns.append(int(s.size))
                    fps.append(audio_fingerprint(s))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "fingerprint": pd.array(fps, dtype="Int64"),
                }
            )

    return df.select(url_col, binary_col).mapInPandas(
        kernel, schema="url string, n_samples long, fingerprint long"
    )
