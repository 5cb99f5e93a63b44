"""Measured evidence for SCALE.md's interval-join hot-bin claim
(VERDICT r14 #6): plant a pathological bin — one outage window whose
bin holds HALF the event rows — and record Spark's AQE skew-join
split actually firing on the bin-id hash equi-join.

The operator's skew story is exactly that the bin id is a PLAIN
hash-join key, so the stock mitigation applies with no code in the
operator: OptimizeSkewedJoin splits the oversized shuffle partition
into advisory-sized sub-reads (``PartialReducerPartitionSpec``) and
replicates the matching probe-side rows. The probe asserts the final
adaptive plan carries ``SortMergeJoin(skew=true)`` + an
``AQEShuffleRead .. skewed`` on the hot side, reports the partition
specs (how many sub-reads the hot bin became), and checks results are
IDENTICAL with skew-split disabled.

Threshold note (the one non-default knob): the probe's hot partition
is ~200k highly regular rows, which lz4 shuffle compression keeps
under the production default ``skewedPartitionThresholdInBytes=256m``
— at probe scale the threshold is lowered (100k) so the rule can see
the skew; at 100 TB a hot bin clears the production default on its
own. Wall times are FIRST-run per fresh session (repeat collects hit
Spark's shuffle reuse and read ~0.1 s); at local[8] probe scale the
split's wall effect is noise — the deliverable is the plan evidence.
Run SOLO (bench discipline).
"""

import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from k8e_fetch_spark.operators.intervals import interval_overlap_join

W = 3600  # 1-hour bins
N_EV = 400_000


def build(spark):
    # half the events land in bin 0 (the outage window); the other
    # half spread uniformly over 1000 bins
    ev = (
        spark.range(N_EV)
        .select(
            F.col("id").alias("eid"),
            F.when(F.col("id") % 2 == 0, (F.col("id") % 3000))
            .otherwise((F.col("id") % 1000 + 1) * W + (F.col("id") % 3000))
            .alias("e_start"),
        )
        .withColumn("e_end", F.col("e_start") + 10)
    )
    out = spark.createDataFrame(
        [(i, 0, W - 1) for i in range(40)]
        + [(100 + i, (i + 1) * W, (i + 1) * W + 600) for i in range(100)],
        "oid long, o_start long, o_end long",
    )
    j = interval_overlap_join(out, ev, "o_start", "o_end", "e_start", "e_end", W)
    return j.groupBy("oid").agg(F.count("*").alias("n_overlaps"))


def aqe_read_specs(root):
    """Walk the final adaptive plan (through query-stage boundaries,
    whose children() are empty) and collect each AQEShuffleRead's
    partition-spec kinds."""
    found = []
    stack = [root]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "AQEShuffleReadExec":
            specs = n.partitionSpecs()
            kinds: dict[str, int] = {}
            for i in range(specs.size()):
                k = specs.apply(i).getClass().getSimpleName()
                kinds[k] = kinds.get(k, 0) + 1
            found.append(kinds)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        if cls == "AdaptiveSparkPlanExec":
            stack.append(n.executedPlan())
        elif cls.endswith("QueryStageExec"):
            stack.append(n.plan())
    return found


def run(skew_enabled: bool):
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"skew-probe-{skew_enabled}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    agg = build(spark)
    t0 = time.time()
    rows = agg.collect()
    wall = time.time() - t0
    plan_root = agg._jdf.queryExecution().executedPlan()
    plan_str = plan_root.toString()
    specs = aqe_read_specs(plan_root)
    spark.stop()
    return rows, wall, plan_str, specs


def main():
    rows_on, wall_on, plan_on, specs_on = run(True)
    rows_off, wall_off, plan_off, _ = run(False)
    assert sorted(rows_on) == sorted(rows_off), "skew split changed results!"
    skew_join = bool(re.search(r"SortMergeJoin\(skew=true\)", plan_on))
    skew_read = bool(re.search(r"AQEShuffleRead.*skewed", plan_on))
    assert not re.search(r"skew=true", plan_off)
    n_splits = max(
        (k.get("PartialReducerPartitionSpec", 0) for k in specs_on), default=0
    )
    print(f"outages joined: {len(rows_on)} rows (identical with skew-split off)")
    print(f"skew ON : first-run wall {wall_on:.2f}s  SortMergeJoin(skew=true)={skew_join}  "
          f"AQEShuffleRead skewed={skew_read}")
    print(f"skew OFF: first-run wall {wall_off:.2f}s")
    print(f"AQEShuffleRead partition specs per read: {specs_on}")
    print(f"hot bin split into {n_splits} PartialReducerPartitionSpec sub-reads")
    for line in plan_on.splitlines():
        if re.search(r"skew=true|skewed", line):
            print("  " + line.strip()[:200])
    if not (skew_join and skew_read and n_splits >= 2):
        raise SystemExit("AQE skew split did NOT fire")


if __name__ == "__main__":
    main()
