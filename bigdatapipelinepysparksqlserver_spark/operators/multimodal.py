"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The pattern for a 100 TB training-data pipeline:

- media lives in a BINARY column (or a reference + byte-range into an
  object store); metadata (codec, dims, duration) is a typed STRUCT
  column so filters on it prune BEFORE any decode work;
- decode / feature-extraction runs as ``mapInPandas`` — Arrow moves
  each partition to Python in columnar batches (no per-row pickling),
  and the decode cost parallelizes with the scan;
- decoded outputs are fixed-width arrays/structs so downstream ops
  (dedup, ANN) stay native.

The actual codecs (PIL/opencv/ffmpeg) are NOT in this container, so the
decode kernels are STUBS: ``decode_image_batches`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (bytes → seeded stats) exercises the full
Spark-side path — schema, batching, partitioning — with real data flow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# typed metadata struct: filterable WITHOUT touching the payload
MEDIA_META = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_META, False),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_luma", FloatType(), False),
        StructField("feature_vec", ArrayType(FloatType(), False), False),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a media table from any source column cast to binary.

    Native expressions only: the payload column is a real BinaryType and
    the metadata struct is computed during the scan (octet_length etc.),
    so metadata predicates are codegen'd and never deserialize payloads.
    """
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("raw").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_batches(media: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Real deployment: replace the kernel body with PIL/torchvision decode
    → resize → embed. Here the codec libraries are unavailable, so
    ``fake=False`` raises NotImplementedError and ``fake=True`` runs a
    DETERMINISTIC surrogate (per-payload byte statistics) that keeps the
    whole distributed path honest: Arrow serialization of binary
    columns, per-partition batching, fixed-width array outputs.

    Scale: decode cost is per-row CPU in Python workers — size
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of
    payloads fits worker memory, and partition the input by size (e.g.
    bucket big videos separately) to avoid stragglers.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/opencv) are not installed in this environment; "
            "pass fake=True for the deterministic surrogate decoder"
        )

    def kernel(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                n = int(buf.size)
                mean = float(buf.mean()) if n else 0.0
                # deterministic "embedding": bucketed byte histogram, L1-normalized
                hist = np.bincount(buf % dim, minlength=dim).astype("float32")
                tot = hist.sum()
                vec = (hist / tot if tot else hist).tolist()
                out.append((mid, n, mean, vec))
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "mean_luma", "feature_vec"]
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Video frame-sampling PLAN (native side): explode a frame-index
    sequence per video from metadata only — the decode of each sampled
    frame is then a mapInPandas kernel like ``decode_image_batches``.

    Keeping the index generation native means the (video × frame) work
    list is built by codegen and can be repartitioned to balance decode
    load BEFORE any Python worker touches bytes.
    """
    # clamp to [1, max_frames]: Spark's sequence(0, -1) would count DOWN,
    # so a sub-interval duration must still yield exactly one frame
    n_frames = F.greatest(
        F.least(
            F.coalesce((F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)),
            F.lit(max_frames),
        ),
        F.lit(1),
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("frame_ts_ms", F.col("frame_index") * F.lit(every_ms))
