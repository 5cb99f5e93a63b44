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


def test_connected_components_known_graph(spark):
    from k8e_fetch_spark.operators.clustering import connected_components

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_from_minhash(spark):
    """End-to-end: near-dup pairs -> components -> keep-one-per-cluster."""
    from k8e_fetch_spark.operators.clustering import connected_components
    from k8e_fetch_spark.operators.similarity import minhash_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog while the cat watches from afar"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " today"),            # near-dup of 1
            (3, base.replace("dog", "wolf")),  # near-dup of 1
            (4, "completely different content about databases and distributed query engines"),
            (5, "completely different content about databases and distributed query engines"),
        ],
        ["doc_id", "text"],
    )
    pairs = minhash_candidate_pairs(docs, "doc_id", "text").filter(F.col("jaccard") > 0.5)
    comps = connected_components(pairs)
    comp_of = {r["node"]: r["component"] for r in comps.collect()}
    # 1,2,3 cluster together; 4,5 cluster together
    assert comp_of[1] == comp_of[2] == comp_of[3]
    assert comp_of[4] == comp_of[5]
    assert comp_of[1] != comp_of[4]
