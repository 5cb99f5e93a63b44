"""Interval-overlap join: the theta join ``[a_start,a_end] overlaps
[b_start,b_end]`` reduced to ONE equi-join via fixed-width bin
bucketing.

A naive overlap join is a non-equi condition, which Spark can only
execute as a broadcast nested loop (fine for a tiny side) or a
cartesian — both non-starters when BOTH sides are large. The standard
reduction (the same one behind Databricks' range-join hints and the
interval-join in stream processors): explode every interval into the
fixed-width bins it touches, equi-join on the bin id (a plain hash
shuffle that scales like any other keyed join), and keep the exact
overlap predicate as a post-join filter.

Duplicate elimination is FREE here — no ``distinct`` shuffle: a pair
of overlapping intervals shares exactly the bins
``[max(a0,b0), min(a1,b1)]`` (each side's explode covers its full bin
span, and overlap makes that range nonempty), so the join additionally
requires ``bin == max(a0, b0)`` — the FIRST shared bin — and each
qualifying pair is emitted exactly once.

Scale contract (100 TB): one explode per side (narrow, factor
``<= interval_len/bin_width + 2``), one hash shuffle on the bin id,
no cartesian, no distinct. Pick ``bin_width`` near the TYPICAL
interval length: too small inflates the explode, too large piles
non-overlapping candidates into each bin for the post-filter to
discard. Callers must bound interval length upstream (cap or split
pathological intervals) — that bounds both the explode factor and
per-bin skew. Bins are derived from the values themselves, so the
join co-partitions without any pre-layout.

Reference parity: no counterpart in k8e-fetch (bash/sed catalog
tooling); part of the typed-relational extension surface
(SURVEY.md §2.6, ext-typed-relational).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join ``left`` × ``right`` on closed-interval overlap
    (``l_start <= r_end AND r_start <= l_end``), each qualifying pair
    exactly once.

    Start/end columns are integer epochs (any unit, as long as all
    four share it) with ``end >= start``. Output carries every column
    of both inputs; the caller aggregates or projects from there.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    # the bin columns are internal scratch; silently overwriting (then
    # dropping) a caller column of the same name would corrupt output
    # (ADVICE r14) — refuse loudly instead. BOTH scratch names are
    # checked against BOTH inputs (ADVICE r15): the final
    # drop('_l_bin', '_r_bin') runs over the JOINED frame, so a left
    # input carrying a '_r_bin' DATA column (or right a '_l_bin')
    # would be dropped from the output just as silently as the
    # same-side collision the guard was first written for.
    for side, df in (("left", left), ("right", right)):
        for scratch in ("_l_bin", "_r_bin"):
            if scratch in df.columns:
                raise ValueError(
                    f"{side} input already has a {scratch!r} column, "
                    "which interval_overlap_join uses as internal "
                    "scratch — rename it before joining"
                )
    w = F.lit(int(bin_width))
    lb = left.withColumn(
        "_l_bin",
        F.explode(F.sequence(F.floor(F.col(l_start) / w), F.floor(F.col(l_end) / w))),
    ).alias("l")
    rb = right.withColumn(
        "_r_bin",
        F.explode(F.sequence(F.floor(F.col(r_start) / w), F.floor(F.col(r_end) / w))),
    ).alias("r")
    first_shared = F.greatest(
        F.floor(F.col(f"l.{l_start}") / w), F.floor(F.col(f"r.{r_start}") / w)
    )
    cond = (
        (F.col("l._l_bin") == F.col("r._r_bin"))  # the equi key (hash shuffle)
        & (F.col(f"l.{l_start}") <= F.col(f"r.{r_end}"))
        & (F.col(f"r.{r_start}") <= F.col(f"l.{l_end}"))
        & (F.col("l._l_bin") == first_shared)  # emit in the first shared bin only
    )
    return lb.join(rb, cond).drop("_l_bin", "_r_bin")
