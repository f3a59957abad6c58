"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; transforms run
as Arrow-batched ``mapInPandas`` over the binary payloads so the bytes never
pass through Python row-at-a-time serde. The container has no codec
libraries, so the actual decode kernels are STUBBED (deterministic fakes /
``NotImplementedError``) — the Spark-side plumbing (schema, partitioning,
UDF signatures, batch shapes) is real and tested.

At 100 TB: binary payloads dominate row size, so every transform projects
only the columns it needs (column pruning keeps untouched media out of the
scan), and ``repartition`` before heavy decode stages sizes batches to
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real impl would use PIL/opencv (not in this container)."""
    raise NotImplementedError("image codecs unavailable in this environment")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from payload bytes — stands in for a
    model forward pass; keeps the pipeline testable end-to-end."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [round(a / 997.0, 6) for a in acc]


def extract_image_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Projects (media_id, payload) only — column pruning drops the rest of
    the row before the Python boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(lambda p: _fake_feature(p, dim)),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset,
    computed from metadata (decode itself is stubbed). Demonstrates the
    explode-by-timeline pattern used for real video pipelines."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_no", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select(
            "media_id",
            "frame_no",
            (F.col("frame_no") * every_ms).alias("offset_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-size stats per media kind — pure JVM expressions."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
            F.round(F.avg(F.octet_length("payload")), 2).alias("avg_bytes"),
        )
    )
