"""Multimodal decode plumbing: the Arrow mapInPandas stages produce
exactly what the stub codec computes (the features column is NOT
SQL-expressible, so its evidence lives here rather than in an oracle;
the geometry columns are additionally oracle-checked by mm_decode_meta).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from k8e_fetch_spark.operators.multimodal import (
    N_FEATURES,
    _fake_decode,
    decode_media,
    frame_sample,
    resize_media,
)
from k8e_fetch_spark.io import load
from tests.conftest import SF_DIR


def test_decode_matches_local_codec(spark):
    """The distributed decode (Arrow batches through mapInPandas) equals
    a driver-side call of the same codec on the same bytes — batching,
    schema coercion, and iterator plumbing add or drop nothing."""
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(20)
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    got = {r["doc_id"]: r for r in decode_media(with_payload).collect()}
    for row in docs.collect():
        payload = row["text"].encode("utf-8")
        width, height, n_frames, features = _fake_decode(payload)
        g = got[row["doc_id"]]
        assert g["byte_len"] == len(payload)
        assert (g["width"], g["height"], g["n_frames"]) == (width, height, n_frames)
        assert len(g["features"]) == N_FEATURES
        for a, b in zip(g["features"], features):
            assert abs(a - b) < 1e-6  # float32 column vs python float


def test_frame_sample_keeps_every_nth(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(8)
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    sampled = frame_sample(decode_media(with_payload), every_nth=2)
    for r in sampled.collect():
        assert list(r["sampled_frames"]) == [i for i in range(r["n_frames"]) if i % 2 == 0]


def test_resize_deterministic_dims(spark):
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(8)
    with_payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    out = resize_media(with_payload, target=(32, 32)).collect()
    assert all((r["out_width"], r["out_height"]) == (32, 32) for r in out)
    assert all(len(r["thumbnail"]) > 0 for r in out)
