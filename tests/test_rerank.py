"""mmr_rerank (operators/rerank.py): greedy MMR over per-query pools —
pinned on hand-computed examples, the diversification property, group
independence, and the short-pool edge."""

from __future__ import annotations


def _run(spark, rel_rows, sim_rows, **kw):
    from k8e_fetch_spark.operators.rerank import mmr_rerank

    rel = spark.createDataFrame(rel_rows, "q_id int, doc_id long, rel double")
    sims = spark.createDataFrame(sim_rows, "q_id int, ad long, bd long, sim double")
    out = mmr_rerank(rel, sims, **kw).collect()
    return sorted(
        ((r["q_id"], r["rank"], r["doc_id"], round(r["mmr"], 9)) for r in out)
    )


def _sym(q, a, b, s):
    return [(q, a, b, s), (q, b, a, s)]


def test_hand_computed_three_docs(spark):
    # rel: d1=0.9 d2=0.8 d3=0.5; d1~d2 near-dups (0.95), d3 diverse (0.1)
    sims = _sym(0, 1, 2, 0.95) + _sym(0, 1, 3, 0.1) + _sym(0, 2, 3, 0.1)
    got = _run(
        spark,
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.5)],
        sims,
        k=3,
        lam=0.7,
        mu=0.3,
    )
    # anchor d1 (mmr = rel = 0.9)
    # step2: d2 = .7*.8-.3*.95 = 0.275 ; d3 = .7*.5-.3*.1 = 0.32 -> d3 wins
    # step3: d2 = .7*.8-.3*max(.95,.1) = 0.275
    assert got == [
        (0, 1, 1, 0.9),
        (0, 2, 3, 0.32),
        (0, 3, 2, 0.275),
    ]


def test_pure_relevance_order_without_mmr_penalty(spark):
    """mu=0 degenerates to relevance order scaled by lam — the
    diversification in the previous test is the penalty's doing."""
    sims = _sym(0, 1, 2, 0.95) + _sym(0, 1, 3, 0.1) + _sym(0, 2, 3, 0.1)
    got = _run(
        spark,
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.5)],
        sims,
        k=3,
        lam=1.0,
        mu=0.0,
    )
    assert [g[2] for g in got] == [1, 2, 3]


def test_anchor_tie_breaks_on_doc_id(spark):
    got = _run(
        spark,
        [(0, 7, 0.9), (0, 3, 0.9)],
        _sym(0, 3, 7, 0.0),
        k=2,
    )
    assert got[0][2] == 3  # lower doc_id anchors


def test_groups_are_independent_and_short_pools_truncate(spark):
    rel = [(0, 1, 0.9), (0, 2, 0.1), (1, 5, 0.4)]
    sims = _sym(0, 1, 2, 0.2)  # q=1 has a single doc, no pairs
    got = _run(spark, rel, sims, k=10)
    by_q = {}
    for q, rank, d, m in got:
        by_q.setdefault(q, []).append((rank, d))
    assert by_q[0] == [(1, 1), (2, 2)]  # pool of 2 < k
    assert by_q[1] == [(1, 5)]  # pool of 1: anchor only


def test_matches_independent_python_reference_on_seeded_pool(spark):
    """Cross-implementation pin: a pure-Python greedy (written without
    looking at the operator) must agree on a seeded random pool —
    scores AND order."""
    import random

    rng = random.Random(14)
    docs = list(range(1, 21))
    rel = {d: round(rng.uniform(-0.5, 1.0), 6) for d in docs}
    sim = {}
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            s = round(rng.uniform(-1.0, 1.0), 6)
            sim[(a, b)] = sim[(b, a)] = s

    lam, mu, k = 0.7, 0.3, 8
    chosen = [min(docs, key=lambda d: (-rel[d], d))]
    expect = [(1, chosen[0], rel[chosen[0]])]
    while len(chosen) < k:
        cand = [d for d in docs if d not in chosen]
        scored = [
            (lam * rel[d] - mu * max(sim[(d, c)] for c in chosen), d) for d in cand
        ]
        s, d = max(scored, key=lambda t: (t[0], -t[1]))
        chosen.append(d)
        expect.append((len(chosen), d, s))

    got = _run(
        spark,
        [(0, d, rel[d]) for d in docs],
        [(0, a, b, s) for (a, b), s in sim.items()],
        k=k,
        lam=lam,
        mu=mu,
    )
    assert [(rank, d, m) for _, rank, d, m in got] == [
        (rank, d, round(m, 9)) for rank, d, m in expect
    ]


def test_multi_q0_slice_bit_equals_single_form(spark):
    """sim_topk_mmr_multi's q_id=0 slice must BIT-equal sim_topk_mmr
    (same corpus exclusion, same rounding at every stage) — the batch
    form is the single form run three times, not a reimplementation."""
    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    single = {
        (r["rank"], r["doc_id"]): r["mmr_score"]
        for r in REGISTRY["sim_topk_mmr"].fn(spark, sf).collect()
    }
    multi = {
        (r["rank"], r["doc_id"]): r["mmr_score"]
        for r in REGISTRY["sim_topk_mmr_multi"].fn(spark, sf).collect()
        if r["q_id"] == 0
    }
    assert multi == single and len(single) == 10


def test_one_directional_sims_match_symmetric(spark):
    """Direction rule (ADVICE r14): the greedy takes the max over
    whichever direction of a pair is present, so shipping ONE
    direction of a symmetric sim gives the same ranking and scores as
    shipping both."""
    rel = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.5)]
    both = _sym(0, 1, 2, 0.95) + _sym(0, 1, 3, 0.1) + _sym(0, 2, 3, 0.1)
    # chosen->candidate direction only (the one the old lookup missed)
    one_cd = [(0, 1, 2, 0.95), (0, 1, 3, 0.1), (0, 2, 3, 0.1)]
    # candidate->chosen direction only
    one_dc = [(0, 2, 1, 0.95), (0, 3, 1, 0.1), (0, 3, 2, 0.1)]
    want = _run(spark, rel, both, k=3)
    assert _run(spark, rel, one_cd, k=3) == want
    assert _run(spark, rel, one_dc, k=3) == want


def test_require_complete_pool_accepts_complete_and_rejects_pruned(spark):
    """ADVICE r15: oracle-pinned callers turn the both-directions pool
    contract into a runtime check. A complete n*(n-1) pool passes and
    scores identically; a pool with a pruned pair (what a future
    near-zero-sim-dropping caller would ship) raises inside the task
    instead of silently diverging from the CTE oracle's inner-join
    drop rule."""
    import pytest

    rel = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.5)]
    both = _sym(0, 1, 2, 0.95) + _sym(0, 1, 3, 0.1) + _sym(0, 2, 3, 0.1)
    assert _run(spark, rel, both, k=3, require_complete_pool=True) == _run(
        spark, rel, both, k=3
    )
    pruned = _sym(0, 1, 2, 0.95) + _sym(0, 1, 3, 0.1)  # (2,3) pair dropped
    with pytest.raises(Exception, match="require_complete_pool"):
        _run(spark, rel, pruned, k=3, require_complete_pool=True)
    # one-directional pools violate the contract too (4 of 6 pairs)
    one_dir = [(0, 1, 2, 0.95), (0, 1, 3, 0.1), (0, 2, 3, 0.1)]
    with pytest.raises(Exception, match="require_complete_pool"):
        _run(spark, rel, one_dir, k=3, require_complete_pool=True)


def test_require_complete_pool_rejects_count_cancelling_pools(spark):
    """ADVICE r16: the guard compares against the EXACT expected pair
    set, so pools where a bad pair numerically cancels a missing one —
    the classes a pure count check waves through — raise too:
    (a) an out-of-pool pair (bd=99) standing in for a missing in-pool
    pair; (b) a duplicated directed pair collapsing in the dict while
    another pair is absent."""
    import pytest

    rel = [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.5)]
    # 6 directed rows, but (2,3)/(3,2) replaced by pairs into doc 99
    out_of_pool = (
        _sym(0, 1, 2, 0.95) + _sym(0, 1, 3, 0.1) + _sym(0, 2, 99, 0.1)
    )
    with pytest.raises(Exception, match="out_of_pool"):
        _run(spark, rel, out_of_pool, k=3, require_complete_pool=True)
    # 6 directed rows, but (1,2) shipped twice and (3,2) missing
    duplicated = (
        _sym(0, 1, 2, 0.95)
        + _sym(0, 1, 3, 0.1)
        + [(0, 2, 3, 0.1), (0, 1, 2, 0.95)]
    )
    with pytest.raises(Exception, match="require_complete_pool"):
        _run(spark, rel, duplicated, k=3, require_complete_pool=True)
    # a duplicate with NO missing pair is still a contract breach
    # (7 rows vs n*(n-1)=6): the row count catches what the set cannot
    dup_only = (
        _sym(0, 1, 2, 0.95)
        + _sym(0, 1, 3, 0.1)
        + _sym(0, 2, 3, 0.1)
        + [(0, 1, 2, 0.95)]
    )
    with pytest.raises(Exception, match="require_complete_pool"):
        _run(spark, rel, dup_only, k=3, require_complete_pool=True)
