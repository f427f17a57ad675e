"""Multimodal columns: image/audio/video as opaque binary columns with typed
metadata, decoded inside Arrow batches.

Round 2 upgrade: the decode step is REAL for two formats that need no
external libraries — uncompressed 24-bit BMP (hand-parsed header + numpy
pixel math) and PCM WAV (stdlib ``wave`` + numpy RMS). Formats we cannot
decode in this container (JPEG/PNG/MP4 need PIL/ffmpeg) still fall through
to the clearly-marked deterministic stub, so a mixed-format corpus never
poisons a batch. The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, one-row-per-row output (no shuffle) — is shared by
all formats.
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


def decode_image_stub(data: bytes) -> dict:
    """DETERMINISTIC FAKE decode for formats this container cannot decode
    (no PIL/ffmpeg): stable pseudo-metadata from a content hash, clearly
    labeled via media_type='unknown'."""
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
