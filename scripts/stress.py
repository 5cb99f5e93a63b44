#!/usr/bin/env python
"""Scale-stress probe (not part of the driver's bench): replicate the
sf0.1 tables N-fold into a temp dir with re-keyed ids, then time the
headline plans there. The point is the SHAPE of the scaling curve —
near-linear wall time vs data volume says the plans (broadcast joins,
partial aggregation, banded LSH) hold as data grows; superlinear says a
shuffle or cross-product is hiding somewhere.

    python scripts/stress.py [N]   # default N=20 (~12M lineitem rows)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from k8e_fetch_spark.queries import REGISTRY, queries  # noqa: E402
from k8e_fetch_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
PROBES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "dedup_exact_documents",
    "events_tumbling_window",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_incremental_minhash",
    "text_winnowing_fingerprint",
    "corpus_prep_pipeline",
    "sim_cosine_lsh",
    "sim_topk_ivf",
    "sim_topk_pq_adc",
    "sim_topk_ivfpq_adc",
    "sim_kmeans_assign",
    "tpch_q21_waiting_supplier",
    "dedup_paragraphs",
    "corpus_clean_mix_pipeline",
    "text_decontaminate_ngram",
    "text_decontaminate_bloom",
    # r9 additions: ExactSubstr span removal (note: the harness's
    # per-copy " v<n>" text suffix makes ~the whole 20x corpus
    # duplicated spans — the WORST case for this op, deliberately),
    # the URL/domain cap, and the salted skew join
    "dedup_substring_spans",
    "text_domain_filter",
    "join_salted_skew",
    # r9: bucketed co-located join (the bucket WRITE pays the one-time
    # shuffle; the probe times write + exchange-free join together —
    # the worst case, a deployment amortizes the write across queries)
    "join_bucketed_colocated",
    # r9: DSIR importance selection (bucket-count + per-doc-sum aggs).
    # dedup_semantic_semdedup is NOT probed by registry name: its scale
    # form needs k scaled ~ n/target (the declared query's fixed k=16
    # would make 20x clusters quadratically large by construction);
    # the dedicated scaled-k probe is recorded in SCALE.md instead.
    "sample_dsir_importance",
    # r17: point-in-time fact join against SCD2 history — the 20x
    # replication grows ORDERS (the fact side) against the fixed
    # customer dimension, exactly the production growth axis; the
    # dimension broadcasts, so the probe measures the fact-side
    # scan + broadcast-hash-join filter
    "join_scd2_point_in_time",
    # r9: C4 line-level cleaning (zero-shuffle scan-local projection)
    "text_line_cleaning",
    # r10: CCNet-style bigram-LM perplexity gate (broadcast model onto
    # the corpus bigram stream; one corpus-sized per-doc-mean shuffle)
    "text_lm_perplexity_filter",
    # r10: full near-dup flow (md5 LSH pairs -> connected components);
    # the local union-find path hands off to the propagation loop above
    # 1M edges
    "dedup_clusters_minhash",
    # r11: watermarked APPEND-mode sessions — the probe measures the
    # full availableNow drain (stream state = only watermark-open
    # sessions per key; the emitted set is watermark-closed sessions)
    "stream_session_window_append",
    # r12: the maintenance pair, probed end to end through their
    # declared queries. Compaction = fragment(32) -> coalesce rewrite
    # -> profile; zorder = min/max normalize -> range-sort write ->
    # read-back z-bucket profile. Both rewrite the corpus once per
    # invocation — the honest maintenance cost; the curve should stay
    # ~linear in bytes (one extra pass, no keyed shuffle in compaction,
    # one range exchange in zorder).
    "maintenance_compact_small_files",
    "maintenance_zorder_layout",
    # r13: BM25 lexical retrieval — the posting filter keeps the first
    # exchange at |matching postings| rows; the curve should track the
    # corpus scan (tokenize is scan-local), not the shuffle
    "text_bm25_search",
    # r13: JVM-native image decode — the warm-plan pass builds the PNG
    # fixture tree (one per corpus fingerprint), so the timed pass
    # measures the decode+checksum scan itself; zero shuffles, the
    # curve should be ~linear in file count
    "mm_jvm_image_decode",
    # r14: URL canonicalization dedup (scan-local expression + one hash
    # aggregate on the canonical key; the id shift is a multiple of the
    # 200-group modulus, so groups deepen 20x rather than multiply)
    "web_url_canonical_dedup",
    # r14: MMR diversification — corpus-sized stage is the top-30
    # candidate scan; pairwise sims + greedy are pool-bounded, so the
    # curve should track the scan. NOTE join_interval_overlap is NOT
    # probed by registry name: replication lands 20x the events in the
    # SAME 30-day window, so the TRUE pair count grows ~N^2 (x400) —
    # the dedicated lower-N curve is recorded in SCALE.md instead
    # (same treatment as dedup_semantic_semdedup).
    "sim_topk_mmr",
    # r14: trailing-window z-score anomaly gate (one keyed shuffle on
    # event_type; 20-row frame per task regardless of corpus size)
    "events_anomaly_zscore",
    # r14: Tukey-fence chars-per-token outlier gate (scan-local ratio,
    # one bounded-cardinality group aggregate, broadcast fence join)
    "quality_outlier_robust",
    # r14: as-of with tolerance (same single-window plan as the plain
    # as-of; the tolerance is a post-window projection)
    "join_asof_tolerance",
    # r15: the composed retrieval pipeline — corpus-sized work is the
    # two leg scans (BM25 posting filter, broadcast query vectors);
    # fusion/pool/greedy are rank-bounded, so the curve should track
    # the scans like text_bm25_search and sim_topk_mmr do
    "sim_retrieval_pipeline_multi",
    # r15: the stateful streaming z-score gate — full availableNow
    # drain through applyInPandasWithState; state is a <=20-double
    # array per key, so growth is the drain's scan + the per-type
    # group traffic (same partition-key widening rule as the batch
    # twin)
    "stream_anomaly_zscore",
    # r15: binary-quantized ANN — the corpus-sized stage is the
    # signature scan + scan-local Hamming (two longs per row); the
    # rescore is a 300-id bounded probe, so the curve should track
    # the scan like the other quantization tiers.
    # NOTE maintenance_scd2_merge / maintenance_scd2_chain are NOT
    # probed by registry name: they read customer, a DIMENSION this
    # harness deliberately does not replicate, so the 20x run would
    # time identical data (measured 1.0x — vacuous). The dedicated
    # scaled-dimension curves (scripts/scd_dim_probe.py, 20x and 100x
    # keys) are recorded in SCALE.md instead (the semdedup/interval
    # treatment).
    "sim_topk_binary_rescore",
    # r15: A-Res weighted sampling — scan-local md5+ln keys, top-200
    # cut via per-partition heaps; the curve should track the scan
    "sample_weighted_aes",
    # r15: nearest-direction as-of — same single user_id window as the
    # rest of the family; the curve should match join_asof_tolerance
    "join_asof_nearest",
    # r18: streaming incremental dedup against the persisted MinHash
    # store. The 20x replication grows the CORPUS (store build +
    # bucket occupancy) while the two ingest batches stay fixed
    # (doc_id<50 selects copy-0 docs only) — the deployment axis: a
    # bounded daily batch against a growing store. The probe times
    # the WHOLE drain including the one-time store build from text
    # (O(corpus), amortized across every later batch in production)
    # plus per-batch flag + O(delta) absorb + manifest vacuum.
    "stream_dedup_incremental_minhash",
]
# fact tables get replicated with shifted keys; dimensions stay as-is
REPLICATE = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def materialize(spark, out_dir: str, n: int) -> None:
    for t in DIMS:
        shutil.copy(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, (key, stride) in REPLICATE.items():
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        copies = df.crossJoin(
            spark.range(n).select(F.col("id").alias("_copy"))
        ).withColumn(key, F.col(key) + F.col("_copy") * stride)
        # documents: perturb text per copy so dedup ops see distinct docs
        if t == "documents":
            copies = copies.withColumn(
                "text", F.concat(F.col("text"), F.lit(" v"), F.col("_copy").cast("string"))
            )
        # r19: write MULTIPLE files (hash-partitioned on the shifted key,
        # deterministic). The previous single-file write also produced a
        # SINGLE ROW GROUP, and a parquet scan cannot split below a row
        # group — every 20x scan stage ran as ONE task, so the 8-vs-32-
        # core ratios this harness fed SCALE.md measured a serial-scan
        # artifact, not the operators (probed r19: sim_cosine_lsh exec
        # was ~6 s at ANY core count / shuffle width, rdd partitions = 1
        # on a 40k-row 1 MB file). 32 files at 20x keeps splits well
        # under the 128 MB cluster default while giving every core real
        # input — the layout a production table would have anyway.
        copies.drop("_copy").repartition(32, F.col(key)).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def run(sf_dir: str, label: str) -> dict[str, float]:
    # r19: BENCH-PARITY session (AQE gated on input size, shuffle width
    # derived from bytes) instead of get_spark defaults. The default
    # session runs AQE unconditionally, and with parallelismFirst=false
    # the 64 MB byte advisory coalesces compact-bytes shuffles (e.g.
    # the LSH candidate-pair (id,id) exchange) to ONE partition — which
    # serializes the compute-dense Arrow cosine verify that follows
    # (probed r19 via event-log stage timeline: a 4.8 s 1-task verify
    # stage dominated sim_cosine_lsh's 20x wall at every core count).
    # The bench gates AQE off below 1 GB for exactly this class of
    # reason; the stress probes must measure the same methodology the
    # bench does or their core-scaling ratios are artifacts.
    from k8e_fetch_spark.session import (
        adaptive_enabled_for_dir,
        shuffle_partitions_for_dir,
    )

    spark = get_spark(
        app_name=f"stress-{label}",
        shuffle_partitions=shuffle_partitions_for_dir(sf_dir),
        extra_conf={
            "spark.sql.adaptive.enabled": str(
                adaptive_enabled_for_dir(sf_dir)
            ).lower()
        },
    )
    qs = queries()
    qs["compress_distinct_status"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for name in PROBES:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm plan
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
    spark.stop()
    return out


def main() -> None:
    # usage: stress.py [N] [probe ...] — an explicit probe list lets the
    # sweep run in time-boxed chunks
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    if len(sys.argv) > 2:
        global PROBES
        PROBES = [p for p in sys.argv[2:] if p in PROBES] or PROBES
    base_times = run(BASE, "1x")
    tmp = tempfile.mkdtemp(prefix="k8e_stress_")
    try:
        spark = get_spark(app_name="stress-materialize")
        materialize(spark, tmp, n)
        spark.stop()
        big_times = run(tmp, f"{n}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    report = {
        "replication": n,
        "base_sec": base_times,
        "scaled_sec": big_times,
        "ratio": {k: round(big_times[k] / max(base_times[k], 1e-6), 1) for k in base_times},
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
