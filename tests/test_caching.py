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


def test_persist_scoped_same_plan_repersist_stays_cached(spark):
    """Re-running a pipeline re-persists the SAME logical plan under the
    same key. CacheManager is plan-keyed, so the eviction of the old
    frame must happen BEFORE the new persist — the reverse order
    registers a no-op persist and then uncaches the plan, leaving the
    new frame silently unpersisted (the r9 warm-bench 3x regression)."""
    from k8e_fetch_spark.functions.caching import _LIVE, persist_scoped

    def build():
        return spark.range(100).selectExpr("id", "id % 7 AS x")

    p1 = persist_scoped("test.plan", build())
    p1.count()
    p2 = persist_scoped("test.plan", build())  # same logical plan
    assert p2.storageLevel != StorageLevel.NONE
    p2.count()
    # the cached data must actually be live in the cache manager
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.lookupCachedData(p2._jdf).isDefined()
    p2.unpersist()
    _LIVE.clear()
