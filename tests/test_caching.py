"""persist_scoped: one live cache entry per call-site key."""

from __future__ import annotations

from pyspark import StorageLevel


def test_persist_scoped_releases_previous(spark):
    from k8e_fetch_spark.functions.caching import _LIVE, persist_scoped

    a = spark.range(10).selectExpr("id", "id * 2 AS x")
    b = spark.range(20).selectExpr("id", "id * 3 AS x")

    pa = persist_scoped("test.scope", a)
    assert pa.storageLevel != StorageLevel.NONE
    pa.count()  # materialize the cache

    pb = persist_scoped("test.scope", b)
    assert pb.storageLevel != StorageLevel.NONE
    # the previous frame under the same key is released (non-blocking
    # unpersist: the storage level resets immediately even if block
    # eviction is async)
    assert pa.storageLevel == StorageLevel.NONE
    assert _LIVE["test.scope"] is pb

    # distinct keys do not evict each other
    pc = persist_scoped("test.other", a)
    assert pb.storageLevel != StorageLevel.NONE
    # cleanup
    pb.unpersist()
    pc.unpersist()
    _LIVE.clear()


def test_persist_scoped_returns_same_dataframe(spark):
    from k8e_fetch_spark.functions.caching import _LIVE, persist_scoped

    df = spark.range(5)
    out = persist_scoped("test.identity", df)
    assert out is df
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2, 3, 4]
    out.unpersist()
    _LIVE.clear()
