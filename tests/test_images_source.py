"""The JVM-native image source (sources/images.py): parity against the
pure-Python PNG codec on identical files (full-pixel, channel-mapped),
the codegen byte-sum helper, the binaryFile bridge, and the quarantine
(dropInvalid) posture. The reference has no media path (its corpus is
CSV/TSV text: /root/reference/bin/fetcher.bash) — this is ext-multimodal
surface; mm_jvm_image_decode drives the same source under the DuckDB
hash gate via the shared oracle-parity sweep."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from k8e_fetch_spark.operators.png import encode_png
from k8e_fetch_spark.sources.images import (
    binary_byte_sum,
    read_binary_files,
    read_images,
)


def _write_fixture_pngs(tmp_path, n=3):
    """Deterministic RGB PNGs; returns {filename: (w, h, pixels)}."""
    out = {}
    for i in range(n):
        w, h = 5 + i, 4 + i
        idx = np.arange(w * h * 3, dtype=np.int64)
        px = ((i * 97 + idx * 11) % 256).astype(np.uint8).tobytes()
        (tmp_path / f"img{i}.png").write_bytes(encode_png(w, h, px))
        out[f"img{i}.png"] = (w, h, px)
    return out


def test_jvm_decode_matches_python_codec_channel_mapped(spark, tmp_path):
    """javax.imageio (JVM source) and operators/png.py must agree on
    every pixel byte. The JVM source emits OpenCV-style BGR; the Python
    codec RGB — so equality holds after reversing the channel axis."""
    fixtures = _write_fixture_pngs(tmp_path)
    rows = read_images(spark, str(tmp_path)).select("image.*").collect()
    assert len(rows) == len(fixtures)
    for r in rows:
        name = r.origin.rsplit("/", 1)[-1]
        w, h, px = fixtures[name]
        assert (r.width, r.height, r.nChannels) == (w, h, 3)
        jvm = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(h, w, 3)
        ours = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        # BGR (JVM) vs RGB (python codec): reverse the channel axis
        assert np.array_equal(jvm[..., ::-1], ours), name


def test_binary_byte_sum_codegen(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\x00\x01\xff\x10"),), (bytearray(b""),), (None,)],
        "data binary",
    )
    got = (
        df.select(binary_byte_sum("data", F.length("data")).alias("s"))
        .rdd.map(lambda r: r.s)
        .collect()
    )
    assert sorted(got, key=lambda x: (x is None, x)) == [0, 272, None]


def test_binary_byte_sum_is_channel_order_invariant(spark):
    """The property the mm_jvm_image_decode oracle leans on: RGB->BGR
    reordering never changes the total byte sum."""
    rgb = bytes(range(30))
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    bgr = arr[:, ::-1].tobytes()
    df = spark.createDataFrame([(bytearray(rgb),), (bytearray(bgr),)], "data binary")
    sums = (
        df.select(binary_byte_sum("data", F.length("data")).alias("s"))
        .rdd.map(lambda r: r.s)
        .collect()
    )
    assert sums[0] == sums[1] == sum(rgb)


def test_read_binary_files_roundtrip_and_glob(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"\x89PNG-not-really")
    (tmp_path / "b.txt").write_bytes(b"text")
    df = read_binary_files(spark, str(tmp_path), glob="*.png")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].path.endswith("a.png")
    assert bytes(rows[0].content) == b"\x89PNG-not-really"
    assert rows[0].length == len(b"\x89PNG-not-really")


def test_read_images_drop_invalid_quarantine(spark, tmp_path):
    _write_fixture_pngs(tmp_path, n=2)
    (tmp_path / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\n garbage")
    ok = read_images(spark, str(tmp_path), drop_invalid=True)
    assert ok.count() == 2
    # with dropInvalid off the broken file still yields a row (routeable
    # to a quarantine sink); its decode failure shows as mode == -1
    # (OpenCV "undefined") rather than killing the scan
    kept = read_images(spark, str(tmp_path), drop_invalid=False)
    assert kept.count() == 3
    bad = [r for r in kept.select("image.*").collect() if "broken" in r.origin]
    assert len(bad) == 1 and bad[0].mode == -1


def test_mm_jvm_image_decode_fixture_reuse(spark):
    """Second invocation must reuse the fingerprint-keyed fixture tree
    (no rewrite) — the same contract as catalog_flatten_tree."""
    import hashlib
    import os
    import tempfile
    from pathlib import Path

    from k8e_fetch_spark.queries.registry import REGISTRY, queries

    queries()
    fn = REGISTRY["mm_jvm_image_decode"].fn
    sf = "/root/testdata/sf0.001"
    fn(spark, sf).count()
    sub = hashlib.md5(sf.encode()).hexdigest()[:8]
    marker = (
        Path(tempfile.gettempdir())
        / f"k8e_jvm_images_{os.getuid()}"
        / f"source_fingerprint_{sub}.json"
    )
    assert marker.exists()
    before = marker.stat().st_mtime_ns
    n = fn(spark, sf).count()
    assert n == 500
    assert marker.stat().st_mtime_ns == before


def test_binary_byte_sum_property_random_bytes(spark):
    """Property: the SWAR codegen byte-sum equals Python's sum(bytes)
    for arbitrary payloads — lengths straddling the 7-byte chunk
    boundary (0, 1, 6, 7, 8, 13, 14, 15) are covered explicitly plus
    random lengths; a seeded batch rather than @given so the whole
    property costs ONE Spark job instead of one per example."""
    import random

    rng = random.Random(13)
    fixed = [0, 1, 6, 7, 8, 13, 14, 15]
    payloads = [bytes(rng.randrange(256) for _ in range(n)) for n in fixed]
    payloads += [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)], "i long, data binary"
    )
    got = {
        r.i: r.s
        for r in df.select(
            "i", binary_byte_sum("data", F.length("data")).alias("s")
        ).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == sum(p), (i, len(p))
