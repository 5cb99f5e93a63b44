"""sample_weighted_aes: the Efraimidis-Spirakis A-Res sample pinned
against an independent pure-Python implementation (md5 from hashlib,
not Spark), plus the weighting property."""

from __future__ import annotations

import hashlib
import math

SF = "/root/testdata/sf0.001"


def _py_reference(rows, k=200):
    scored = []
    for doc_id, n_chars in rows:
        if n_chars <= 0:
            continue
        h = int(hashlib.md5(f"aes:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        # the house round_fixed arithmetic, applied BEFORE the cut
        # (ADVICE r15) — exactly what both engines do
        s = math.floor((math.log(u) / n_chars) * 1e9 + 0.5) / 1e9
        scored.append((s, doc_id, n_chars))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(d, n, s) for s, d, n in scored[:k]]


def test_matches_pure_python_reference_exactly(spark):
    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    corpus = [
        (r["doc_id"], r["n_chars"])
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    ]
    want = _py_reference(corpus)
    got = [
        (r["doc_id"], r["n_chars"], r["aes_key"])
        for r in REGISTRY["sample_weighted_aes"].fn(spark, SF).collect()
    ]
    # order-insensitive (driver compare sorts); membership + keys exact
    assert sorted(got) == sorted(want)


def test_weighting_favors_heavy_docs(spark):
    """Selection is length-weighted: the sampled docs' mean n_chars
    must exceed the corpus mean by a wide margin (probability of
    inclusion scales with w)."""
    from pyspark.sql import functions as F

    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    corpus_mean = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample = REGISTRY["sample_weighted_aes"].fn(spark, SF).collect()
    sample_mean = sum(r["n_chars"] for r in sample) / len(sample)
    assert sample_mean > corpus_mean * 1.1, (sample_mean, corpus_mean)
