"""Multimodal column plumbing — binary assets with typed metadata.

Treats image/audio/video payloads as opaque ``BINARY`` columns plus a
typed metadata struct, processed with Arrow-batched ``mapInPandas``
(the right shape for per-asset decode at scale: batches stream through
Python with zero row-at-a-time overhead, and partitioning/pushdown stay
intact because metadata lives in ordinary columns).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed: ``decode_stub=True`` produces a
deterministic fake decode (hash-derived dimensions and stats) with the
real schema, batch shape, and partitioning; ``decode_stub=False`` raises
NotImplementedError where the codec call belongs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_brightness", IntegerType()),
    ]
)


def fake_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic binary assets for plumbing tests: text bytes as
    payload, kind assigned round-robin."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def decode_assets(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    Real implementation would call the codec per payload inside the
    batch loop; the stub derives deterministic pseudo-metadata from the
    payload bytes so the full Spark plumbing (schema, batching,
    partition preservation) is exercised and testable.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real image/audio/video codecs are not available in this "
                    "environment; install PIL/ffmpeg and replace this branch"
                )
            digests = [
                hashlib.md5(bytes(p)).digest() if p is not None else b"\x00" * 16
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [16 + d[0] % 240 for d in digests],
                    "height": [16 + d[1] % 240 for d in digests],
                    "n_frames": [
                        1 if k == "image" else 1 + d[2] % 100
                        for k, d in zip(pdf["kind"], digests)
                    ],
                    "mean_brightness": [d[3] for d in digests],
                }
            )
            yield out

    return assets.mapInPandas(batches, DECODED_SCHEMA)


def resize_images(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize planning is plain column algebra; the pixel work would be
    another mapInPandas stage over the payload column."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.withColumn("target_width", F.ceil(F.col("width") * scale).cast("int")).withColumn(
        "target_height", F.ceil(F.col("height") * scale).cast("int")
    )


def sample_frames(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per kept
    frame index (sequence + explode keeps it JVM-side)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        decoded.where(F.col("kind") == "video")
        .select("asset_id", F.explode(frames).alias("frame_idx"))
    )
