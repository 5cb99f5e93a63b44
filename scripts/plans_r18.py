#!/usr/bin/env python
"""Dump .explain("formatted") plans for the r18 optimization round.

Usage: python scripts/plans_r18.py before|after [query ...]

Writes plans/r18/<query>_<tag>.txt for each named query (default: the
round's touched set). sf0.1 session with the bench session shape
(shuffle width + AQE gate from the data dir) so the plans match what
bench.py executes.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from k8e_fetch_spark.queries import queries  # noqa: E402
from k8e_fetch_spark.session import (  # noqa: E402
    adaptive_enabled_for_dir,
    get_spark,
    shuffle_partitions_for_dir,
)

TOUCHED = [
    "sim_topk_binary_rescore",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_planted",
    "dedup_clusters_minhash",
    "dedup_incremental_minhash",
    "sim_cosine_lsh",
    "sim_cosine_lsh_planted",
    "sim_retrieval_pipeline_multi",
    "corpus_clean_mix_pipeline",
    "sample_dsir_importance",
    "dedup_semantic_semdedup",
    "join_scd2_point_in_time",
    "dedup_ngram_jaccard",
    "text_bm25_search",
    "dedup_substring_spans",
    "text_winnowing_fingerprint",
    "corpus_prep_pipeline",
    "tpch_q21_waiting_supplier",
    "text_domain_filter",
    "sim_kmeans_assign",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or TOUCHED
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="plans-r18",
        shuffle_partitions=shuffle_partitions_for_dir(sf_dir),
        extra_conf={
            "spark.sql.adaptive.enabled": str(adaptive_enabled_for_dir(sf_dir)).lower()
        },
    )
    out_dir = Path(REPO_ROOT) / "plans" / "r18"
    out_dir.mkdir(parents=True, exist_ok=True)
    qs = queries()

    def formatted(df) -> str:
        return (
            df._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            .strip()
        )

    for name in names:
        df = qs[name](spark, sf_dir)
        (out_dir / f"{name}_{tag}.txt").write_text(formatted(df) + "\n")
        print("wrote", name, tag, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
