#!/usr/bin/env python
"""Measured row-group-pruning probe for ``scd2_as_of`` (VERDICT r17 #2).

The operator's docstring claims the point-in-time read's two range
predicates prune at the parquet footer on a min/max-clustered layout.
This probe MEASURES that claim instead of asserting it:

1. Build a mostly-append SCD2 history at scale (millions of keys, keys
   born across 40 versions, one mid-life change each — so
   ``effective_from`` correlates with ingest order, exactly what a real
   CDC-accreted history looks like).
2. Write it twice: range-sorted on ``effective_from``
   (``write_range_sorted`` — the maintenance layout this repo already
   ships) and round-robin shuffled (the no-maintenance strawman), with
   small parquet blocks so each file holds several row groups.
3. Verify Spark pushes the AS-OF predicates to the scan
   (``PushedFilters`` contains the ``effective_from``/``effective_to``
   range filters).
4. Compute row-groups-SELECTED vs total from the parquet footers
   themselves (pyarrow statistics, evaluating the same conjunction the
   pushed filters express — this is the number the vectorized reader's
   row-group skip sees).
5. Time the AS-OF read end to end on both layouts (best of 3).

Usage:  python scripts/scd_asof_probe.py [n_keys]   # default 4_000_000
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from k8e_fetch_spark.operators.scd import scd2_as_of  # noqa: E402
from k8e_fetch_spark.session import get_spark  # noqa: E402

N_VERSIONS = 40
AS_OF = 8  # an early version: a mostly-append history read "as of" the
# past is the pruning-relevant shape (recent row groups all skip)


def build_history(spark, n_keys: int):
    """Closed-form history: key k is born at version k % 40 with one
    change 1-7 versions later (when that lands before 40). ~1.9 rows
    per key, effective_from correlated with key order — the append
    shape — without paying 40 scd2_apply rounds at probe scale."""
    base = spark.range(n_keys).select(
        F.col("id").alias("k"),
        (F.col("id") % N_VERSIONS).cast("int").alias("_born"),
        ((F.col("id") % 7) + 1).cast("int").alias("_gap"),
    )
    chg = (F.col("_born") + F.col("_gap")).cast("int")
    has_chg = chg < N_VERSIONS
    first = base.select(
        "k",
        F.concat(F.lit("v0_"), F.col("k").cast("string")).alias("a"),
        F.col("_born").alias("effective_from"),
        F.when(has_chg, chg).cast("int").alias("effective_to"),
    )
    second = base.filter(has_chg).select(
        "k",
        F.concat(F.lit("v1_"), F.col("k").cast("string")).alias("a"),
        chg.alias("effective_from"),
        F.lit(None).cast("int").alias("effective_to"),
    )
    return first.unionByName(second)


def footer_rowgroups(path: str, as_of: int) -> tuple[int, int]:
    """(selected, total) row groups under the pushed conjunction
    effective_from <= as_of AND (effective_to IS NULL OR
    effective_to > as_of), evaluated exactly the way a footer-stats
    reader does: a group survives unless its stats PROVE no row can
    match."""
    import pyarrow.parquet as pq

    total = selected = 0
    total_b = selected_b = 0
    for f in sorted(Path(path).rglob("*.parquet")):
        if f.name.startswith((".", "_")):
            continue
        md = pq.ParquetFile(str(f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            total_b += g.total_byte_size
            sf = g.column(names["effective_from"]).statistics
            st = g.column(names["effective_to"]).statistics
            # effective_from <= v fails for the whole group iff min > v
            if sf is not None and sf.has_min_max and sf.min > as_of:
                continue
            # (effective_to IS NULL OR effective_to > v) fails iff the
            # group has no nulls AND max <= v
            if (
                st is not None
                and st.has_min_max
                and st.null_count == 0
                and st.max <= as_of
            ):
                continue
            selected += 1
            selected_b += g.total_byte_size
    return selected, total, selected_b, total_b


def timed_read(spark, path: str, as_of: int) -> float:
    best = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        scd2_as_of(spark.read.parquet(path), as_of).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    try:
        import os

        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    spark = get_spark(app_name="scd-asof-probe")
    hist = build_history(spark, n_keys)

    tmp = tempfile.mkdtemp(prefix="k8e_asof_probe_")
    sorted_dir = f"{tmp}/sorted"
    shuffled_dir = f"{tmp}/shuffled"
    # small blocks (writer-level option — a runtime spark.hadoop.* set
    # does NOT reach the committer) -> several row groups per file, so
    # the probe measures ROW-GROUP skipping, not just file-level
    # pruning. The write IS write_range_sorted's shape
    # (operators/scale.py:122 — repartitionByRange +
    # sortWithinPartitions), inlined only to thread the block-size
    # option through.
    (
        hist.repartitionByRange(16, F.col("effective_from"), F.col("k"))
        .sortWithinPartitions("effective_from", "k")
        .write.mode("overwrite")
        .option("parquet.block.size", str(2 << 20))
        .parquet(sorted_dir)
    )
    (
        hist.repartition(16)
        .write.mode("overwrite")
        .option("parquet.block.size", str(2 << 20))
        .parquet(shuffled_dir)
    )

    plan = (
        scd2_as_of(spark.read.parquet(sorted_dir), AS_OF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = "PushedFilters: [" in plan and "effective_from" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]

    sel_s, tot_s, selb_s, totb_s = footer_rowgroups(sorted_dir, AS_OF)
    sel_r, tot_r, selb_r, totb_r = footer_rowgroups(shuffled_dir, AS_OF)
    t_sorted = timed_read(spark, sorted_dir, AS_OF)
    t_shuffled = timed_read(spark, shuffled_dir, AS_OF)
    n_out = scd2_as_of(spark.read.parquet(sorted_dir), AS_OF).count()

    print(
        {
            "n_keys": n_keys,
            "history_rows": hist.count(),
            "as_of": AS_OF,
            "as_of_rows": n_out,
            "pushed_filters_on_scan": pushed,
            "rowgroups_sorted": f"{sel_s}/{tot_s}",
            "rowgroups_shuffled": f"{sel_r}/{tot_r}",
            "bytes_decoded_sorted_mb": round(selb_s / 1e6, 1),
            "bytes_decoded_shuffled_mb": round(selb_r / 1e6, 1),
            "bytes_total_mb": round(totb_s / 1e6, 1),
            "wall_sorted_s": t_sorted,
            "wall_shuffled_s": t_shuffled,
            "load_avg_start": load,
        }
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
