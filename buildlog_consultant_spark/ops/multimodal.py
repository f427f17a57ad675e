"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this container):
``decode_image_stub`` produces deterministic fake features derived from the
bytes, clearly marked. The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signature, partition behavior — is real and tested; swapping the
stub for PIL/ffmpeg is a one-function change on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

MEDIA_META_SCHEMA = (
    "url string, media_type string, n_bytes long, sha1 string, "
    "fake_width int, fake_height int, fake_mean_luma double"
)


def decode_image_stub(data: bytes) -> dict:
    """DETERMINISTIC FAKE decode: stands in for a real image decoder.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(data));
    raising NotImplementedError here would poison whole batches, so the stub
    derives stable pseudo-metadata from a content hash instead.
    """
    h = hashlib.sha1(data).digest()
    return {
        "fake_width": 64 + h[0] % 192,
        "fake_height": 64 + h[1] % 192,
        "fake_mean_luma": h[2] / 255.0,
    }


def extract_media_meta(df, binary_col: str = "html", url_col: str = "url"):
    """mapInPandas over the binary column: metadata + stubbed decode features.

    Batch shape: the binary column arrives as Arrow LargeBinary → pandas
    bytes objects; output is one row per input row (no fan-out), so the
    stage pipelines with the scan and never shuffles.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[binary_col]):
                data = bytes(data) if data is not None else b""
                meta = decode_image_stub(data)
                rows.append(
                    {
                        "url": url,
                        "media_type": "text/html",
                        "n_bytes": len(data),
                        "sha1": hashlib.sha1(data).hexdigest(),
                        **meta,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "url", "media_type", "n_bytes", "sha1",
                "fake_width", "fake_height", "fake_mean_luma",
            ])

    return df.select(url_col, binary_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)
