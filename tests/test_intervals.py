"""interval_overlap_join (operators/intervals.py): the bucketed
equi-join reduction must be EXACTLY the non-equi overlap join —
pinned against a brute-force cross-filter on corpora engineered
around the bin geometry (touching endpoints, containment, zero-length
intervals, spans straddling many bins, bin-boundary starts)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from k8e_fetch_spark.operators.intervals import interval_overlap_join


def _brute(spark, left, right):
    return (
        left.crossJoin(right)
        .filter(
            (F.col("v_start") <= F.col("o_end"))
            & (F.col("o_start") <= F.col("v_end"))
        )
        .select("vid", "oid")
    )


def _pairs(df):
    return sorted((r["vid"], r["oid"]) for r in df.select("vid", "oid").collect())


@pytest.mark.parametrize("bin_width", [7, 100, 1000])
def test_matches_brute_force_on_seeded_random_intervals(spark, bin_width):
    rng = random.Random(20260816)
    lrows = [
        (i, s, s + d)
        for i in range(120)
        for s, d in [(rng.randrange(0, 3000), rng.randrange(0, 400))]
    ]
    rrows = [
        (i, s, s + d)
        for i in range(90)
        for s, d in [(rng.randrange(0, 3000), rng.choice([0, 1, 50, 999]))]
    ]
    left = spark.createDataFrame(lrows, "vid int, v_start long, v_end long")
    right = spark.createDataFrame(rrows, "oid int, o_start long, o_end long")
    got = interval_overlap_join(
        left, right, "v_start", "v_end", "o_start", "o_end", bin_width
    )
    assert _pairs(got) == _pairs(_brute(spark, left, right))
    # exactly-once: no pair may be emitted twice even when intervals
    # share many bins
    raw = got.select("vid", "oid").collect()
    assert len(raw) == len(set((r["vid"], r["oid"]) for r in raw))


def test_bin_geometry_edges(spark):
    """Closed-interval semantics at the exact boundaries: touching
    endpoints overlap, one-off endpoints don't, zero-length intervals
    on a bin boundary work, containment across many bins emits once."""
    left = spark.createDataFrame(
        [
            (1, 100, 100),  # zero-length on a bin boundary (w=100)
            (2, 0, 1000),  # spans 11 bins
            (3, 205, 299),  # strictly inside one bin
        ],
        "vid int, v_start long, v_end long",
    )
    right = spark.createDataFrame(
        [
            (10, 100, 100),  # touches vid=1 exactly
            (11, 101, 199),  # misses vid=1 by one
            (12, 300, 405),  # inside vid=2's span; touches vid=3? no (299<300)
            (13, 299, 299),  # touches vid=3's right endpoint
        ],
        "oid int, o_start long, o_end long",
    )
    got = _pairs(
        interval_overlap_join(
            left, right, "v_start", "v_end", "o_start", "o_end", 100
        )
    )
    assert got == [
        (1, 10),
        (2, 10),
        (2, 11),
        (2, 12),
        (2, 13),
        (3, 13),
    ]


def test_rejects_nonpositive_bin_width(spark):
    df = spark.createDataFrame([(1, 0, 1)], "vid int, v_start long, v_end long")
    with pytest.raises(ValueError):
        interval_overlap_join(df, df, "v_start", "v_end", "v_start", "v_end", 0)


def test_plan_is_equi_join_no_cartesian(spark):
    """The scale contract: the physical plan joins on the bin id —
    SortMergeJoin/ShuffledHashJoin with an equi key, never
    CartesianProduct or BroadcastNestedLoopJoin-without-keys."""
    rows = [(i, i * 10, i * 10 + 25) for i in range(2000)]
    left = spark.createDataFrame(rows, "vid int, v_start long, v_end long")
    right = spark.createDataFrame(rows, "oid int, o_start long, o_end long")
    # defeat auto-broadcast so the strategy choice is honest
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = interval_overlap_join(
            left, right, "v_start", "v_end", "o_start", "o_end", 100
        )._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_rejects_scratch_column_collision(spark):
    """ADVICE r14: inputs already carrying the internal '_l_bin' /
    '_r_bin' scratch names must be refused, not silently overwritten
    and dropped."""
    clean = spark.createDataFrame([(1, 0, 10)], "vid long, v_start long, v_end long")
    dirty_l = clean.withColumn("_l_bin", F.lit(1))
    dirty_r = spark.createDataFrame(
        [(1, 0, 10, 9)], "oid long, o_start long, o_end long, _r_bin long"
    )
    with pytest.raises(ValueError, match="_l_bin"):
        interval_overlap_join(dirty_l, clean.toDF("oid", "o_start", "o_end"),
                              "v_start", "v_end", "o_start", "o_end", 10)
    with pytest.raises(ValueError, match="_r_bin"):
        interval_overlap_join(clean, dirty_r,
                              "v_start", "v_end", "o_start", "o_end", 10)


def test_rejects_cross_side_scratch_collision(spark):
    """ADVICE r15: BOTH scratch names are checked against BOTH inputs
    — the final drop runs over the joined frame, so a LEFT input
    carrying a '_r_bin' data column (or right a '_l_bin') would lose
    that column just as silently as the same-side case."""
    clean = spark.createDataFrame([(1, 0, 10)], "vid long, v_start long, v_end long")
    left_with_rbin = clean.withColumn("_r_bin", F.lit(7))
    right_with_lbin = spark.createDataFrame(
        [(1, 0, 10, 9)], "oid long, o_start long, o_end long, _l_bin long"
    )
    with pytest.raises(ValueError, match="left .* '_r_bin'"):
        interval_overlap_join(left_with_rbin, clean.toDF("oid", "o_start", "o_end"),
                              "v_start", "v_end", "o_start", "o_end", 10)
    with pytest.raises(ValueError, match="right .* '_l_bin'"):
        interval_overlap_join(clean, right_with_lbin,
                              "v_start", "v_end", "o_start", "o_end", 10)
