#!/usr/bin/env python
"""Training-corpus curation walkthrough: the round-5 operator stack,
step by step, over the synthetic documents table.

    python examples/curation_flow.py [sf_dir]

1. Ingest    — jsonl in (explicit schema, corrupt lines quarantined).
2. Dedup     — paragraph-level exact dedup, keep-first reassembly.
3. Score     — quality re-score of the cleaned text + floor.
4. Mix       — temperature-weighted source sampling (alpha = 0.5).
5. Split     — deterministic train/val/test hash assignment.
6. Validate  — declarative constraint checks before the sink.
7. Layout    — partitioned-by-split, range-sorted parquet out.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from pyspark.sql import functions as F  # noqa: E402

from k8e_fetch_spark.io import load  # noqa: E402
from k8e_fetch_spark.operators.scale import write_partitioned  # noqa: E402
from k8e_fetch_spark.queries import REGISTRY, queries  # noqa: E402
from k8e_fetch_spark.session import get_spark  # noqa: E402
from k8e_fetch_spark.sources.jsonl import (  # noqa: E402
    DOCUMENTS_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curation-flow", cpus=8, shuffle_partitions=8)
    queries()
    work = Path(tempfile.mkdtemp(prefix="curation_"))

    # 1. jsonl round trip with quarantine (documents -> jsonl -> back)
    landing = str(work / "landing")
    write_jsonl(load(spark, sf_dir, "documents"), landing)
    docs = read_jsonl(spark, landing, DOCUMENTS_SCHEMA)
    good, bad = split_corrupt(docs)
    print(f"== ingest: {good.count()} docs, {bad.count()} quarantined ==")

    # 2-5. the composed flow as ONE declared plan (paragraph dedup ->
    # quality floor -> temperature mix -> split), oracle-checked
    curated = REGISTRY["corpus_clean_mix_pipeline"].fn(spark, sf_dir)
    print("== curated sample ==")
    curated.show(5, truncate=40)
    print("== per-split counts ==")
    curated.groupBy("split").count().show()

    # 6. validate before the sink
    print("== constraint checks ==")
    REGISTRY["quality_constraint_checks"].fn(spark, sf_dir).show(truncate=40)

    # 7. land it: split directories, each file range-clustered on doc_id
    out = str(work / "curated")
    write_partitioned(curated, out, ["split"])
    back = spark.read.parquet(out)
    print(f"== landed {back.count()} rows under {out} ==")
    # NB DataFrame.inputFiles() lists the base relation's files WITHOUT
    # applying the filter's partition pruning (it read the whole file
    # index), so it cannot demonstrate pruning — list the hive layout
    # directly; the pruning proof itself lives in tests/test_scale.py.
    print(
        "partition dirs:",
        sorted(p.name for p in Path(out).iterdir() if p.name.startswith("split=")),
    )
    spark.stop()


if __name__ == "__main__":
    main()
