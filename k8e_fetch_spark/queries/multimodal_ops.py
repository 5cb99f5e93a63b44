"""Multimodal-column queries: binary payload metadata (oracle-checked)
and the Arrow-batched decode pipeline (rows-only; deterministic stub)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k8e_fetch_spark.io import load
from k8e_fetch_spark.operators.multimodal import decode_media, frame_sample, resize_media
from k8e_fetch_spark.queries.registry import register


@register(
    "mm_binary_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               sha256(text) AS digest,
               CAST(doc_id % 3 = 0 AS BOOLEAN) AS is_video
        FROM documents
    """,
    tags=("ext-multimodal", "binary-meta"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payloads with typed metadata: byte length + content
    digest + a modality flag. The payload here is the UTF-8 encoding of
    ``text`` (deterministic on both engines); real media bytes flow
    through the identical plan."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.sha2(payload, 256).alias("digest"),
        (F.col("doc_id") % 3 == 0).alias("is_video"),
    )


@register("mm_resize_thumbnail", oracle=None, tags=("ext-multimodal", "resize-stub"))
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop media pipeline: binary payload -> resize/thumbnail stage
    (second Arrow mapInPandas hop, stubbed resample). Deterministic;
    returns fixed 32x32 dims + thumbnail byte length per doc."""
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    resized = resize_media(with_payload)
    return resized.select(
        "doc_id", "out_width", "out_height", F.length("thumbnail").alias("thumb_bytes")
    )


@register("mm_decode_features", oracle=None, tags=("ext-multimodal", "decode-stub"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline end-to-end: binary column -> Arrow-batched
    mapInPandas decode (stubbed codec) -> typed feature frame -> frame
    sampling. Deterministic, so repeat runs hash identically."""
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    decoded = decode_media(with_payload)
    # Serialize array columns at the query boundary: downstream
    # consumers (and the grading driver's pandas canonicalizer) need
    # hashable scalar cells; the arrays stay typed inside the plan.
    return frame_sample(decoded).select(
        "doc_id",
        "byte_len",
        "width",
        "height",
        "n_frames",
        F.to_json("sampled_frames").alias("sampled_frames"),
        F.to_json("features").alias("features"),
    )


@register(
    "mm_decode_meta",
    # The stub codec's geometry is a pure function of payload byte
    # length (operators/multimodal.py:_fake_decode), so everything
    # except the byte-histogram features is SQL-expressible — this
    # hash-checks the REAL mapInPandas decode path (Arrow batches,
    # schema, frame sampling) against ground truth computed relationally.
    oracle="""
        WITH base AS (
            SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        )
        SELECT doc_id,
               n AS byte_len,
               CAST(64 + (n % 512) AS INTEGER) AS width,
               CAST(64 + ((n // 2) % 512) AS INTEGER) AS height,
               CAST(1 + (n % 4) AS INTEGER) AS n_frames,
               CASE WHEN 1 + (n % 4) >= 3 THEN '[0,2]' ELSE '[0]' END AS sampled_frames
        FROM base
    """,
    tags=("ext-multimodal", "decode-oracle"),
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline's metadata, oracle-checked: the same
    mapInPandas decode + frame-sample hops as mm_decode_features, with
    the declared output restricted to the columns the stub computes as
    a pure function of payload length (dims, frame count, sampled frame
    indexes). A real codec swap keeps the plan and drops the oracle —
    exactly the boundary documented in operators/multimodal.py."""
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    decoded = decode_media(with_payload)
    return frame_sample(decoded).select(
        "doc_id",
        "byte_len",
        "width",
        "height",
        "n_frames",
        F.to_json("sampled_frames").alias("sampled_frames"),
    )
