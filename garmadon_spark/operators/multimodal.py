"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow batch shape,
``mapInPandas`` signatures, partition sizing; the pixel/sample decoding
itself is STUBBED (no imaging/audio libraries in this environment):
``decoder=`` accepts any callable ``bytes -> np.ndarray``; the default
``fake_decoder`` is deterministic (content-hash-seeded) so tests are
reproducible, and ``strict_decoder`` raises NotImplementedError to mark
the integration point for PIL/libav/etc.

Scale notes:
- media rows are LARGE (KB-MB): keep ``spark.sql.files.maxPartitionBytes``
  default (128 MB) so a partition holds hundreds of rows, not millions;
  ``media_table_schema`` carries byte size as a column so repartitioning
  by cumulative size is possible without reading blobs.
- every operator is ``mapInPandas`` (Arrow-batched, streaming per
  partition) — blobs never transit as Python rows one at a time, and the
  iterator form keeps peak memory at one Arrow batch.
- feature vectors come back as array<float> columns → feed directly into
  operators/similarity.py (IVF/brute-force).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("mime", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("metadata", MapType(StringType(), StringType())),
    ]
)


def fake_decoder(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real media decoder: derives a pseudo
    'pixel' array from the content hash.  Same bytes ⇒ same array."""
    digest = hashlib.sha256(content or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.random((16, 16, 3), dtype=np.float32)


def strict_decoder(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an imaging/audio library not present in "
        "this environment; inject a decoder (bytes -> ndarray)"
    )


def make_media_fixture(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Synthetic media table: deterministic binary blobs + metadata."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        blob = hashlib.sha256(f"{seed}:{i}".encode()).digest() * rng.randint(
            4, 64
        )
        rows.append(
            {
                "media_id": i,
                "media_type": mtype,
                "mime": {"image": "image/png", "audio": "audio/wav",
                         "video": "video/mp4"}[mtype],
                "content": bytearray(blob),
                "n_bytes": len(blob),
                "metadata": {"width": "640", "height": "480"}
                if mtype == "image"
                else {"duration_ms": str(rng.randint(1000, 60000))},
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decoder,
    dim: int = 16,
) -> DataFrame:
    """Decode → pooled feature vector per media row.  mapInPandas keeps
    the blob inside the Arrow batch; output is a narrow table that joins/
    indexes cheaply (similarity.build_ivf consumes it directly)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                arr = decoder(bytes(content))
                flat = arr.reshape(-1)
                pooled = flat[: dim * (len(flat) // dim)].reshape(dim, -1).mean(
                    axis=1
                )
                feats.append(pooled.astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 8,
    height: int = 8,
    decoder: Callable[[bytes], np.ndarray] = fake_decoder,
) -> DataFrame:
    """Image resize plumbing: decode → nearest-neighbor downsample →
    re-encode (raw float bytes in the stub).  Non-image rows are filtered
    out BEFORE Python (predicate stays JVM-side)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                arr = decoder(bytes(content))
                ys = np.linspace(0, arr.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, arr.shape[1] - 1, width).astype(int)
                small = arr[np.ix_(ys, xs)]
                out.append(small.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        fn, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (row-expanding mapInPandas — the Arrow batch contract for 1→N ops).
    The stub slices the byte stream at fixed strides; a real decoder
    would seek keyframes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(blob[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )
