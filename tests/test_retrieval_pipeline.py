"""sim_retrieval_pipeline_multi (VERDICT r14 #4): the composed
BM25 -> RRF -> MMR retrieval pipeline must be the PROVEN components
wired together — its fusion stage bit-equals sim_hybrid_rrf_multi,
and its greedy is the same mmr_rerank operator. Composition seams
(pool cut, embeddings inner join) get their own pins."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fused_stage_top10_bit_equals_hybrid_rrf_multi(spark):
    """The pipeline's fusion stage, cut to per-query top-10 the way
    sim_hybrid_rrf_multi cuts, must BIT-equal that row's output — the
    pipeline is not a reimplementation of fusion."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded
    from k8e_fetch_spark.queries.similarity import _retrieval_fused

    _ensure_loaded()
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    fused10 = sorted(
        (r["q_id"], r["doc_id"], r["rrf"], r["r_lex"], r["r_vec"])
        for r in _retrieval_fused(spark, SF)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .drop("rnk")
        .collect()
    )
    want = sorted(
        (r["q_id"], r["doc_id"], r["rrf"], r["r_lex"], r["r_vec"])
        for r in REGISTRY["sim_hybrid_rrf_multi"].fn(spark, SF).collect()
    )
    assert fused10 == want


def test_pipeline_anchor_is_top_fused_doc(spark):
    """Rank-1 per query is the pure-relevance anchor: the highest
    fused score among pool members (and its mmr_score IS that score)."""
    from pyspark.sql import functions as F

    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded
    from k8e_fetch_spark.queries.similarity import _retrieval_fused

    _ensure_loaded()
    out = REGISTRY["sim_retrieval_pipeline_multi"].fn(spark, SF).collect()
    anchors = {r["q_id"]: (r["doc_id"], r["mmr_score"]) for r in out if r["rank"] == 1}
    fused = _retrieval_fused(spark, SF).collect()
    for q in (0, 1, 2):
        best = min(((-r["rrf"], r["doc_id"]) for r in fused if r["q_id"] == q))
        assert anchors[q] == (best[1], round(-best[0], 6))


def test_pipeline_shape_and_dedup(spark):
    """10 rows per query, ranks 1..10, no doc repeated within a query."""
    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = REGISTRY["sim_retrieval_pipeline_multi"].fn(spark, SF).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["doc_id"]))
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert sorted(rank for rank, _ in rows) == list(range(1, 11))
        assert len({d for _, d in rows}) == 10
