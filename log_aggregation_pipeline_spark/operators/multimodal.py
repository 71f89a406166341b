"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the codec step is STUBBED because this
container has no image/audio libraries: ``decode_media`` tries the
real decoder import and, absent it, either raises
``NotImplementedError`` (strict mode) or computes deterministic
byte-level features (default) so downstream stages exercise real data
flow.  Swap ``_decode_real`` in when PIL/av are on the executors —
nothing else changes.

Scale posture: binaries never pass through Python row-wise; each
``mapInPandas`` batch hands numpy views of the Arrow buffers to the
extractor.  Partition sizing for ~MB-scale blobs is controlled by
``spark.sql.files.maxPartitionBytes`` + ``maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), True),  # opaque payload
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("sig", T.StringType()),
    ]
)


def fake_media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents.parquet: the
    UTF-8 text bytes stand in for an encoded payload; kind/meta derive
    from doc_id.  Same shape a real ingest would produce."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            (F.col("doc_id") % 1920 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 1080 + 1).cast("int").alias("height"),
            F.lit(16_000).cast("int").alias("sample_rate"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
        ).alias("meta"),
    )


def _try_real_decoders() -> bool:
    try:  # pragma: no cover - libs absent in this image
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _byte_features(buf: bytes | bytearray | None) -> tuple[int, float, str]:
    if buf is None:
        return 0, 0.0, ""
    arr = np.frombuffer(bytes(buf), dtype=np.uint8)
    if arr.size == 0:
        return 0, 0.0, ""
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / arr.size
    entropy = float(np.round(-(p * np.log2(p)).sum(), 6))
    return int(arr.size), entropy, hashlib.md5(arr.tobytes()).hexdigest()[:16]


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode + feature-extract each blob (Arrow batches).

    strict=True demands real codecs (raises NotImplementedError here —
    the clearly-marked stub point).  Default computes deterministic
    byte-level features so the pipeline shape is fully exercised."""
    has_real = _try_real_decoders()
    if strict and not has_real:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/av on the executors; "
            "not available in this environment (stub documented in "
            "operators.multimodal)"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_entropy": [f[1] for f in feats],
                    "sig": [f[2] for f in feats],
                }
            )

    return df.select("media_id", "kind", "media").mapInPandas(
        extract, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_bytes", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Image 'resize' stub: deterministic byte-downsampling (every
    stride-th byte to ``target_bytes``) standing in for a thumbnail
    encoder; the batch shape and binary-out plumbing are the real
    thing."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for b in pdf["media"]:
                arr = np.frombuffer(bytes(b or b""), dtype=np.uint8)
                stride = max(1, len(arr) // target_bytes)
                thumbs.append(arr[::stride][:target_bytes].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_bytes": [len(t) for t in thumbs],
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "media")
        .mapInPandas(resize, RESIZED_SCHEMA)
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling stub: split the payload into n_frames
    equal byte slices (one output row per frame — a 1:N mapInPandas,
    the UDTF-shaped surface of SURVEY.md §2.11)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["media"]):
                arr = bytes(b or b"")
                step = max(1, len(arr) // n_frames)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(arr[i * step : (i + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": blobs})

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "media")
        .mapInPandas(frames, FRAME_SCHEMA)
    )
