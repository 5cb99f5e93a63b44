#!/usr/bin/env python
"""Dedicated scaled-DIMENSION probe for the SCD2 rows.

The main stress harness (scripts/stress.py) replicates FACT tables
only — customer is a dimension, so a registry-name 20x run of the SCD2
queries times identical data (measured 1.0x — vacuous). This probe
scales the dimension itself: replicate customer with a 1e9 key stride
(large enough that the queries' planted +20M "new key" space cannot
collide with any replica's key range), materialize a minimal sf layout,
and run the DECLARED query shapes end to end at 1x and Nx.

    python scripts/scd_dim_probe.py [N]      # default 20
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

from k8e_fetch_spark.queries import queries  # noqa: E402
from k8e_fetch_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
# the stream twin measures the whole CDC machinery (single-file batch
# staging, availableNow drain, per-step parquet state) over the same
# scaled dimension — the merge/chain rows measure the operator plan
PROBES = (
    "maintenance_scd2_merge",
    "maintenance_scd2_chain",
    "stream_scd2_chain",
    # r17: the tombstone twins — same planted-key space rule (the
    # +30M unknown-key delete space also stays inside the 1e9 stride)
    "maintenance_scd2_tombstones",
    "stream_scd2_tombstones",
)


def run(spark, sf_dir: str) -> dict[str, float]:
    qs = queries()
    out = {}
    for name in PROBES:
        # warm pass + best-of-3 (this host shows random multi-second
        # stalls on multi-threaded stages — bench.py discipline)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(app_name="scd-dim-probe")
    base = spark.read.parquet(f"{BASE}/customer.parquet")
    n_keys = base.count()

    tmp = tempfile.mkdtemp(prefix="k8e_scd_probe_")
    for label, copies in (("1x", 1), (f"{n}x", n)):
        d = f"{tmp}/{label}"
        Path(d).mkdir()
        (
            base.crossJoin(spark.range(copies).select(F.col("id").alias("_c")))
            .withColumn("c_custkey", F.col("c_custkey") + F.col("_c") * 1_000_000_000)
            .drop("_c")
            .write.mode("overwrite")
            .parquet(f"{d}/customer.parquet")
        )
    import os

    load1 = os.getloadavg()
    t1 = run(spark, f"{tmp}/1x")
    tn = run(spark, f"{tmp}/{n}x")
    load2 = os.getloadavg()
    print(f"keys: {n_keys} -> {n_keys * n}; load {load1} -> {load2}")
    for name in PROBES:
        print(f"{name}: {t1[name]}s -> {tn[name]}s ({tn[name] / t1[name]:.1f}x)")
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
