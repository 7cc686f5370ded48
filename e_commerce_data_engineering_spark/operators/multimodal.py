"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11).

Assets are opaque ``binary`` columns with a typed metadata struct —
the layout a 100 TB training-data lake uses (content-addressed bytes +
sidecar metadata, partitioned by modality). Heavy per-asset work runs
as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row-at-a-time.

The decode step is STUBBED: image/audio codecs (Pillow, ffmpeg, …) are
not in this container. ``decode_asset`` raises NotImplementedError
unless ``fake=True``, which parses our deterministic synthetic payload
header instead — the Spark-side plumbing (schemas, batching, partition
behavior) is real and tested either way.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

_MAGIC = b"FAKE"


def make_fake_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic assets: payload = b'FAKE' + packed
    (w, h, seed, asset_id) + filler bytes. Stands in for real media so
    the distributed plumbing is exercised end-to-end."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        w, h = 64 + (i * 7) % 512, 64 + (i * 13) % 512
        payload = _MAGIC + struct.pack("<iiqq", w, h, seed, i) + bytes((i + j) % 251 for j in range(128))
        rows.append(
            (
                i,
                modality,
                payload,
                ("fake", w, h, 16000 if modality == "audio" else None, 1000 + i, ),
            )
        )
    # partition count proportional to data size: a tiny demo frame must
    # not fan out to defaultParallelism Arrow workers (worker startup
    # would dwarf the work); a real asset table arrives pre-split.
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    return spark.createDataFrame(rows, ASSET_SCHEMA).coalesce(n_parts)


def decode_asset(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary → structural info via mapInPandas (Arrow batches).

    Real codecs are unavailable in this environment: ``fake=False``
    raises NotImplementedError at plan-build time (fail fast, not per
    task); ``fake=True`` parses the synthetic payload header.
    """
    if not fake:
        raise NotImplementedError(
            "Image/audio decode requires codec libraries not present in this "
            "container. Use fake=True for the deterministic synthetic decoder, "
            "or plug a real decoder into _decode_batch."
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                b = bytes(content)
                if b[:4] == _MAGIC:
                    w, h, _seed, _i = struct.unpack("<iiqq", b[4:28])
                else:  # unknown payload: structural fallback only
                    w = h = None
                checksum = 0
                for byte in b:
                    checksum = (checksum * 31 + byte) % (1 << 61)
                out.append((asset_id, modality, w, h, len(b), checksum))
            yield pd.DataFrame(
                out, columns=["asset_id", "modality", "width", "height", "n_bytes", "checksum"]
            )

    return assets.mapInPandas(_decode_batch, DECODED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Bytes → fixed-dim float feature vector via mapInPandas. The
    arithmetic is a deterministic stand-in (byte-histogram folding);
    the batching/schema/shuffle shape is exactly what a real CLIP/VGGish
    featurizer would use."""

    def _feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                vec = [0.0] * dim
                for j, byte in enumerate(b):
                    vec[j % dim] += byte / 255.0
                norm = sum(v * v for v in vec) ** 0.5 or 1.0
                out.append((asset_id, [float(v / norm) for v in vec]))
            yield pd.DataFrame(out, columns=["asset_id", "feature"])

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )
    return assets.mapInPandas(_feat_batch, schema)


def sample_video_frames(assets: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset
    (timestamps from meta.duration_ms — no decode needed for planning).
    The actual frame extraction would live in the mapInPandas decode."""
    frames = assets.filter(F.col("modality") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def resize_image(assets: DataFrame, max_side: int = 256, fake: bool = False) -> DataFrame:
    """Image resize plumbing via mapInPandas: bytes in → resized bytes
    out, aspect ratio preserved, only rows exceeding ``max_side``
    rewritten. Real resampling needs Pillow (absent here): fake=True
    rewrites the synthetic payload header with the clamped dimensions
    and passes bytes through, which keeps schema/batching/partition
    behavior identical to the real operator.
    """
    if not fake:
        raise NotImplementedError(
            "Image resize requires Pillow/libvips, not present in this "
            "container. Use fake=True for the header-rewrite stand-in, or "
            "plug a real resampler into _resize_batch."
        )

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:4] == _MAGIC:
                    w, h, seed, i = struct.unpack("<iiqq", b[4:28])
                    scale = max_side / max(w, h) if max(w, h) > max_side else 1.0
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    b = _MAGIC + struct.pack("<iiqq", nw, nh, seed, i) + b[28:]
                else:
                    nw = nh = None
                out.append((asset_id, nw, nh, b))
            yield pd.DataFrame(out, columns=["asset_id", "width", "height", "content"])

    imgs = assets.filter(F.col("modality") == "image").select("asset_id", "content")
    return imgs.mapInPandas(_resize_batch, RESIZED_SCHEMA)
