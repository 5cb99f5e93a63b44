"""Iterative k-means (Lloyd's) over embeddings: the engine's
iterative-algorithm pattern. Verifies the Lloyd's invariant (inertia
monotonically non-increasing), assignment completeness, and
winnowing fingerprint overlap semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k8e_fetch_spark.operators.clustering import kmeans
from tests.conftest import SF_DIR


def test_kmeans_inertia_monotone(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assigned, inertia = kmeans(emb, k=6, iterations=4)
    assert len(inertia) == 4
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a * (1 + 1e-9), inertia  # Lloyd's never increases inertia
    assert inertia[-1] < inertia[0]  # and actually improves on this data
    n = emb.count()
    got = assigned.count()
    assert got == n  # every vector assigned exactly once
    assert assigned.select("centroid_id").distinct().count() <= 6


def test_winnowing_overlap_semantics(spark):
    from k8e_fetch_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and keeps running far away"),
            (2, "the quick brown fox jumps over the lazy dog and keeps running far away"),
            (3, "the quick brown fox jumps over the lazy cat and keeps running far away"),
            (4, "entirely unrelated content with completely different words everywhere today"),
        ],
        ["doc_id", "text"],
    )
    fps: dict[int, set] = {}
    for r in winnowing_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] == fps[2]  # identical docs -> identical fingerprints
    j_edit = len(fps[1] & fps[3]) / len(fps[1] | fps[3])
    j_unrel = len(fps[1] & fps[4]) / len(fps[1] | fps[4])
    assert j_edit > 0.2  # one-word edit keeps substantial overlap
    assert j_unrel == 0.0
