"""Multimodal column operators (SURVEY.md §2.6).

Images/audio/video are opaque ``binary`` columns with typed metadata
alongside. The Spark-side plumbing — schemas, Arrow-batched
``mapInPandas`` decode stages, batch shapes, partition sizing — is real
and tested; the actual codec call is stubbed behind a deterministic
fake (the image/audio libraries are not in this container; a real
deployment swaps ``_fake_decode`` for PIL/ffmpeg/torchaudio without
touching the plan).

Scale notes (100 TB of media): decode runs inside ``mapInPandas`` with
an iterator signature, so one task streams many Arrow batches without
materializing the partition; binary payloads never pass through Python
row-at-a-time pickling. Partition sizing is controlled upstream by
``spark.sql.files.maxPartitionBytes`` on the binary source.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Decoded-media feature schema: what a real image decode would emit.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

N_FEATURES = 8


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real codec.

    Raises nothing and depends only on the payload bytes, so results
    are reproducible. Replace with e.g. ``PIL.Image.open`` in a real
    deployment; the surrounding Arrow plumbing is unchanged.
    """
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n // 2) % 512)
    n_frames = 1 + (n % 4)
    # "features": byte-histogram-ish moments, cheap and deterministic
    features = []
    for i in range(N_FEATURES):
        chunk = payload[i::N_FEATURES]
        features.append(float(sum(chunk) % 997) / 997.0 if chunk else 0.0)
    return width, height, n_frames, features


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode stage: binary payload -> typed features.

    ``mapInPandas`` with an iterator: streams batches, never holds a
    whole partition; the returned frame conforms to
    ``MEDIA_FEATURES_SCHEMA`` so downstream plans are fully typed.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": [len(p) for p in pdf[payload_col]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("thumbnail", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize/thumbnail stage: second Arrow-batched ``mapInPandas`` hop
    after decode. The resample call is stubbed (deterministic byte
    slice standing in for PIL ``Image.resize``); the real plumbing —
    binary in, fixed-dims + binary out, iterator batching — is what a
    production codec drops into."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = target
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_width": w,
                    "out_height": h,
                    # stub "resample": deterministic strided byte sample of
                    # the payload, sized like a w*h/8 thumbnail
                    "thumbnail": [
                        p[:: max(1, len(p) // max(1, (w * h) // 8))] if p else b""
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(resize_batches, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling over decoded media: explode frame indexes and
    keep every nth — pure column ops (the per-frame decode would live
    in a second mapInPandas stage in a real pipeline)."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    kept = F.filter(frames, lambda i: i % every_nth == 0)
    return df.withColumn("sampled_frames", kept)
