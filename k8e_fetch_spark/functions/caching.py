"""Scoped persistence for intermediate frames that must outlive the
query function that built them.

A handful of pipelines persist an intermediate (the Bloom eval-gram
set, the unigram vocabulary) because it is consumed by BOTH an
in-function action (count / scalar collect / bitmap build) and the
returned DataFrame's eventual execution — unpersisting before return
would recompute the whole explode+shuffle chain at materialization
time. But a bare ``persist()`` with no matching ``unpersist()`` leaks:
while Spark's CacheManager dedupes an identical logical plan (re-
running the same query against the same data re-uses one entry),
each DIFFERENT plan (another sf_dir, a changed filter) registers a
new entry that lives until context shutdown. Repeated driver
hash-compare re-runs, warm/cold bench loops, and stress probes all
hit this.

``persist_scoped`` bounds the leak at ONE live entry per call-site:
the next call through the same site unpersists the previous frame
(non-blocking — in-flight executions of the prior plan recompute
from lineage, which is correct, just slower) before persisting the
new one.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LOCK = threading.Lock()
_LIVE: dict[str, DataFrame] = {}


def persist_scoped(
    key: str, df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df``, releasing whatever the same ``key`` persisted on
    the previous call. Returns ``df`` (persisted).

    Concurrency contract: the registry swap itself is lock-guarded, so
    interleaved calls from two threads cannot corrupt ``_LIVE`` — but
    the CALL-SITE keying assumes one pipeline per key at a time. Two
    concurrent runs of the same pipeline in one process evict each
    other's frame mid-flight, and because Spark's CacheManager is
    PLAN-keyed, unpersisting one key's frame also uncaches any other
    key holding the same logical plan. Either way the loser silently
    recomputes from lineage — correct results, lost caching. Callers
    needing true concurrent isolation should pass a caller-unique key
    (e.g. ``f"minhash.shingles.{run_id}"``)."""
    with _LOCK:
        prev = _LIVE.pop(key, None)
        # ORDER MATTERS: unpersist the previous frame BEFORE persisting
        # the new one. CacheManager is plan-keyed — when the same
        # pipeline re-runs, ``df`` carries the same logical plan as
        # ``prev``, so persist-then-unpersist would register a no-op
        # ("already cached") and then UNCACHE the plan, leaving the new
        # frame silently unpersisted (measured 3x wall on the LSH
        # pipelines' warm passes).
        if prev is not None:
            try:
                prev.unpersist(blocking=False)
            except Exception:
                pass  # a stopped/replaced context invalidates the handle
        _LIVE[key] = df.persist(level)
    return df
