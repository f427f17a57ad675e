"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, decoded inside Arrow batches.

Real decoders, no external libraries needed:

- uncompressed 24-bit BMP — hand-parsed header + numpy pixel stats;
- PCM WAV — stdlib ``wave`` + integer RMS;
- PNG (8-bit RGB) — FULL decode with stdlib ``zlib``: chunk walk, IDAT
  inflate, all five scanline de-filters, numpy pixel stats; other PNG
  color types still yield real IHDR width/height (header-level);
- JPEG — header-level: SOFn marker walk gives real width/height (a full
  entropy decode needs a DCT pipeline; out of scope without PIL).

Formats the container genuinely cannot decode (MP4/video need ffmpeg)
fall through to the clearly-marked deterministic stub, so a mixed-format
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
    "fake_width int, fake_height int"
)

_META_COLS = [
    "url", "media_type", "n_bytes", "sha1",
    "width", "height", "mean_r_milli", "mean_g_milli", "mean_b_milli",
    "sample_rate", "n_samples", "rms_milli",
    "fake_width", "fake_height",
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
    stats. Returns None if the bytes aren't such a BMP."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        return None
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(data) < pixel_offset + row_size * h:
        return None
    raw = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=pixel_offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    bgr = rows.astype(np.int64)
    return {
        "width": w,
        "height": h,
        # exact integer milli-means: sums are ints, so both an independent
        # oracle and this decoder land on identical values
        "mean_r_milli": int(bgr[:, :, 2].sum() * 1000 // (w * h)),
        "mean_g_milli": int(bgr[:, :, 1].sum() * 1000 // (w * h)),
        "mean_b_milli": int(bgr[:, :, 0].sum() * 1000 // (w * h)),
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


def decode_wav(data: bytes) -> Optional[dict]:
    """Real decode of a PCM WAV (stdlib wave): header fields + integer RMS
    over 16-bit samples. Returns None if the bytes aren't a PCM WAV."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data), "rb") as f:
            if f.getsampwidth() != 2:
                return None
            n = f.getnframes()
            sr = f.getframerate()
            frames = f.readframes(n)
    except (wave.Error, EOFError):
        return None
    samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
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


def decode_png(data: bytes) -> Optional[dict]:
    """Real PNG decode via stdlib zlib: chunk walk → IHDR dims; for 8-bit
    RGB (color type 2, no interlace) additionally inflates IDAT, reverses
    the scanline filters, and computes the exact integer milli-means.
    Other color types return header-level width/height (still real
    metadata — IHDR is authoritative). Returns None if not a PNG."""
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
    out = {"width": int(width), "height": int(height)}
    # pixel decode is bounded by the DECLARED dimensions, never by what
    # the stream inflates to: a crafted IHDR (50000×50000) or an IDAT
    # zlib bomb on crawl data must not OOM the executor — dims above the
    # cap keep header-level metadata only, and the inflate is told the
    # exact expected byte count (decompress's max_length) so a bomb stops
    # at the declared size instead of expanding to gigabytes
    _MAX_DECODE_PIXELS = 16 * 1024 * 1024  # 48 MB of RGB + filter bytes
    if (
        bitdepth == 8
        and colortype == 2
        and interlace == 0
        and idat
        and width * height <= _MAX_DECODE_PIXELS
    ):
        import zlib

        expected = height * (width * 3 + 1)
        try:
            d = zlib.decompressobj()
            raw = d.decompress(idat, expected)
            if d.unconsumed_tail or len(raw) < expected:
                return out  # stream longer or shorter than IHDR declares
        except zlib.error:
            return out
        px = _png_defilter(raw, width, height)
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
    jpg = decode_jpeg_header(data)
    if jpg is not None:
        out.update(jpg)
        out["media_type"] = "image/jpeg"
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
                      "n_samples", "rms_milli"):
                out[c] = out[c].astype("Int64")
            yield out

    return df.select(url_col, binary_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)
