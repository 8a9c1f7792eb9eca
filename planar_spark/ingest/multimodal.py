"""Multimodal columns: opaque binary payloads + typed metadata.

Web-crawl pipelines carry images/audio alongside html. The engine
treats such payloads as opaque ``binary`` columns with typed metadata
structs, and runs decode / feature-extract steps as Arrow-batched
``mapInPandas`` operators so the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested even though the actual
codec libraries are not in this container.

``decode_image_batch`` is therefore STUBBED: with ``fake=True``
(default here) it produces a deterministic feature vector from the
bytes; with ``fake=False`` it uses PIL when importable (installing
codecs flips the path with ZERO code change) and raises
NotImplementedError otherwise. Swapping in a different real decoder
changes ONE function, not the dataflow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "url string, media_type string, payload binary, "
    "width int, height int, n_bytes long"
)
FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode+embed: feature j = byte j of
    md5(payload) / 256. Each value is an exact dyadic rational, so it is
    identical in float32, float64, and the DuckDB oracle SQL
    (CAST('0x'||substr(md5(.),2j+1,2) AS INT) / 256.0) — the decode stub
    itself is cross-system checkable, not just the plumbing."""
    h = hashlib.md5(payload).digest()
    reps = (dim + len(h) - 1) // len(h)
    return (np.frombuffer(h * reps, dtype=np.uint8)[:dim] / 256.0).astype(
        np.float32
    )


def _real_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decode+embed via PIL: decode, resize to a 4x4 grayscale
    thumbnail, features = the 16 pixel intensities / 255. Import is
    deferred so environments without codecs never pay for it."""
    import io

    from PIL import Image  # noqa: import-outside-toplevel

    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
    return (
        np.asarray(img, dtype=np.float32).reshape(-1)[:dim] / 255.0
    ).astype(np.float32)


def decode_image_batch(
    batches: Iterator[pd.DataFrame], fake: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: (url, payload, ...) -> (url, feature)."""
    if not fake:
        try:
            import PIL  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real image decode requires PIL/libvips — not in this "
                "container; run with fake=True or install codecs"
            ) from exc
    decode = _fake_decode if fake else _real_decode
    for pdf in batches:
        feats = [decode(bytes(p)).tolist() for p in pdf["payload"]]
        yield pd.DataFrame({"url": pdf["url"], "feature": feats})


def extract_media_features(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """media table -> (url, feature array<float>). Partition-preserving;
    the decode runs as Arrow batches, never row-at-a-time."""
    def op(batches):
        return decode_image_batch(batches, fake=fake)

    return media_df.select("url", "payload").mapInPandas(
        op, schema="url string, feature array<float>"
    )


def synth_media_df(spark, num_rows: int = 64) -> DataFrame:
    """Deterministic fixture media table (payload = seeded bytes)."""
    rows = []
    for i in range(num_rows):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append(
            (
                f"https://site{i % 7}.example/img/{i}.png",
                "image/png",
                bytearray(payload),
                32,
                32,
                len(payload),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
