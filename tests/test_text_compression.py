"""Compression-ratio quality signal: the REAL Python-stage pattern.

DEFLATE output size is not SQL-expressible, so this op is rows-only in
the registry; here its values are pinned against direct zlib on the
same rows — the strongest non-oracle evidence available — plus
determinism across runs.
"""

from __future__ import annotations

import zlib

import duckdb

from k8e_fetch_spark.operators.text import compression_ratio
from tests.conftest import SF_DIR


def test_compression_ratio_matches_direct_zlib(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r["doc_id"]: (r["raw_bytes"], r["compressed_bytes"], r["compression_ratio"])
        for r in compression_ratio(docs).collect()
    }
    con = duckdb.connect()
    expected_rows = con.execute(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(expected_rows)
    for doc_id, text in expected_rows:
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        want = (len(raw), comp, round(comp / len(raw), 6) if raw else 0.0)
        assert got[doc_id] == want, doc_id
    # sanity on the signal's semantics: repetitive text compresses far
    # better than the corpus median
    ratios = sorted(v[2] for v in got.values())
    median = ratios[len(ratios) // 2]
    boiler = spark.createDataFrame(
        [(0, "the same sentence again and again. " * 50)], "doc_id long, text string"
    )
    boiler_ratio = compression_ratio(boiler).collect()[0]["compression_ratio"]
    assert boiler_ratio < median / 2


def test_compression_ratio_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(map(tuple, compression_ratio(docs).collect()))
    b = sorted(map(tuple, compression_ratio(docs).collect()))
    assert a == b
