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


# Full oracle for the decode pipeline INCLUDING the byte-histogram
# features: the stub codec's feature i is (sum of payload bytes at
# positions i, i+8, i+16, ... mod 997) / 997.0 (float32), so feature*997
# is an exact integer recoverable from the float — the query emits those
# integers (f0..f7) as the engine-portable serialization, and DuckDB
# recomputes them relationally via hex-pair byte extraction. This
# hash-checks the REAL Arrow decode path end to end, features included.
_DECODE_FEATURES_ORACLE = """
    WITH base AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               hex(encode(text)) AS h
        FROM documents
    ),
    feats AS (
        SELECT doc_id, n,
               list_transform(range(0, 8),
                 i -> CAST(COALESCE(list_sum(list_transform(range(i, n, 8),
                        j -> CAST('0x' || substr(h, 2*j+1, 2) AS INT))), 0) % 997 AS INT)
               ) AS fi
        FROM base
    )
    SELECT doc_id,
           n AS byte_len,
           CAST(64 + (n % 512) AS INTEGER) AS width,
           CAST(64 + ((n // 2) % 512) AS INTEGER) AS height,
           CAST(1 + (n % 4) AS INTEGER) AS n_frames,
           CASE WHEN 1 + (n % 4) >= 3 THEN '[0,2]' ELSE '[0]' END AS sampled_frames,
           fi[1] AS f0, fi[2] AS f1, fi[3] AS f2, fi[4] AS f3,
           fi[5] AS f4, fi[6] AS f5, fi[7] AS f6, fi[8] AS f7
    FROM feats
"""


@register(
    "mm_decode_features",
    oracle=_DECODE_FEATURES_ORACLE,
    tags=("ext-multimodal", "decode-stub"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pipeline end-to-end: binary column -> Arrow-batched
    mapInPandas decode (stubbed codec) -> typed feature frame -> frame
    sampling. Deterministic, so repeat runs hash identically; the
    features serialize as exact integers (feature*997 — integral by
    the stub's construction) so the full decode output is oracle-
    checkable cross-engine without float-rendering hazards."""
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    decoded = decode_media(with_payload)
    # Serialize array columns at the query boundary: downstream
    # consumers (and the grading driver's pandas canonicalizer) need
    # hashable scalar cells; the arrays stay typed inside the plan.
    # float32 relative error is ~6e-8, so feature*997 (< 997) is within
    # 6e-5 of the true integer and floor(x + 0.5) recovers it exactly.
    feature_ints = [
        F.floor(F.col("features")[i] * 997 + F.lit(0.5)).cast("int").alias(f"f{i}")
        for i in range(8)
    ]
    return frame_sample(decoded).select(
        "doc_id",
        "byte_len",
        "width",
        "height",
        "n_frames",
        F.to_json("sampled_frames").alias("sampled_frames"),
        *feature_ints,
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
