"""scd2_apply (operators/scd.py): the SCD Type-2 merge rules pinned on
hand-computed cases — change, no-op, brand-new key, NULL-attribute
stability, closed-history passthrough, chained re-application."""

from __future__ import annotations

from pyspark.sql import functions as F

from k8e_fetch_spark.operators.scd import scd2_apply


def _tbl(spark, rows):
    return spark.createDataFrame(
        rows, "k long, a string, effective_from int, effective_to int"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, a string")


def _key(t):
    # None-tolerant total order for result/expected comparison
    return tuple((v is None, v) for v in t)


def _rows(df):
    return sorted(
        (
            (r["k"], r["a"], r["effective_from"], r["effective_to"])
            for r in df.collect()
        ),
        key=_key,
    )


def test_change_noop_new_and_closed_passthrough(spark):
    cur = _tbl(
        spark,
        [
            (1, "x", 0, None),   # will change
            (2, "y", 0, None),   # no-op update
            (3, "z", 0, None),   # not in batch
            (4, "old", 0, 5),    # closed history
            (4, "new", 5, None), # open row of the same key, not in batch
        ],
    )
    upd = _upd(spark, [(1, "x2"), (2, "y"), (9, "fresh")])
    got = _rows(scd2_apply(cur, upd, "k", ["a"], version=7))
    assert got == sorted(
        [
            (1, "x", 0, 7),
            (1, "x2", 7, None),
            (2, "y", 0, None),
            (3, "z", 0, None),
            (4, "old", 0, 5),
            (4, "new", 5, None),
            (9, "fresh", 7, None),
        ],
        key=_key,
    )


def test_null_attribute_compare_is_stable(spark):
    """NULL vs NULL is a no-op; NULL -> value and value -> NULL are
    changes (null-safe compare, not SQL three-valued equality)."""
    cur = _tbl(spark, [(1, None, 0, None), (2, "v", 0, None), (3, None, 0, None)])
    upd = _upd(spark, [(1, None), (2, None), (3, "now")])
    got = _rows(scd2_apply(cur, upd, "k", ["a"], version=1))
    assert got == sorted(
        [
            (1, None, 0, None),      # NULL == NULL: no churn
            (2, "v", 0, 1),
            (2, None, 1, None),
            (3, None, 0, 1),
            (3, "now", 1, None),
        ],
        key=_key,
    )


def test_multi_attribute_any_difference_versions(spark):
    cur = spark.createDataFrame(
        [(1, "x", 10, 0, None), (2, "y", 20, 0, None)],
        "k long, a string, b int, effective_from int, effective_to int",
    )
    upd = spark.createDataFrame([(1, "x", 11), (2, "y", 20)], "k long, a string, b int")
    out = scd2_apply(cur, upd, "k", ["a", "b"], version=3)
    got = sorted(
        (
            (r["k"], r["a"], r["b"], r["effective_from"], r["effective_to"])
            for r in out.collect()
        ),
        key=_key,
    )
    assert got == sorted(
        [(1, "x", 10, 0, 3), (1, "x", 11, 3, None), (2, "y", 20, 0, None)],
        key=_key,
    )


def test_chained_reapplication_builds_history(spark):
    cur = _tbl(spark, [(1, "v0", 0, None)])
    v1 = scd2_apply(cur, _upd(spark, [(1, "v1")]), "k", ["a"], version=1)
    v2 = scd2_apply(v1, _upd(spark, [(1, "v2")]), "k", ["a"], version=2)
    # and a final no-op against the v2 value
    v3 = scd2_apply(v2, _upd(spark, [(1, "v2")]), "k", ["a"], version=3)
    assert _rows(v3) == [(1, "v0", 0, 1), (1, "v1", 1, 2), (1, "v2", 2, None)]


def test_plan_is_one_join_one_generate(spark):
    """The merge is ONE full-outer join + one explode — no second scan
    of the current table, no window, no distinct."""
    cur = _tbl(spark, [(1, "x", 0, None)])
    upd = _upd(spark, [(1, "x2")])
    plan = (
        scd2_apply(cur, upd, "k", ["a"], version=1)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Join FullOuter") == 1
    assert "Window" not in plan and "Deduplicate" not in plan
