"""MMR (maximal marginal relevance) re-ranking — the diversification
pass a retrieval stack runs AFTER scoring (Carbonell & Goldstein 1998):
greedily pick the candidate maximizing
``lam * rel(d) - mu * max_{s in chosen} sim(d, s)``,
so near-duplicate hits stop crowding the top-k.

Execution shape: MMR is inherently sequential *per query* (each pick
depends on the set chosen so far) but embarrassingly parallel *across
queries* — exactly ``applyInPandas``'s contract. Each group is one
query's bounded candidate pool (top-N from any retrieval leg, N tens
not thousands) carried as (rel, pairwise-sim) rows; the greedy loop
runs on ≤N² numbers inside one Arrow batch. At 100 TB the corpus-sized
work (scoring, top-N cut) happens upstream in scan/TakeOrdered stages;
this operator only ever touches pools, distributed one group per task
across however many queries the batch carries. The driver sees
nothing.

Float-parity contract (the DuckDB oracle runs the same greedy as a
recursive CTE): ``rel`` and ``sim`` arrive PRE-ROUNDED, and ``mu`` is
an explicit parameter — NEVER computed as ``1 - lam`` (``1 - 0.7`` is
``0.30000000000000004`` in binary float; the SQL literal ``0.3`` is
not). With identical operands, ``lam*rel - mu*max_sim`` is the same
IEEE double on both engines, so argmax decisions agree bit-for-bit;
ties break on doc_id.

Reference parity: no counterpart in k8e-fetch; part of the
similarity-search extension surface (SURVEY.md §2.6, ext-topk-sim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "q_id int, rank int, doc_id bigint, mmr double"


def mmr_rerank(
    rel: DataFrame,
    sims: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    mu: float = 0.3,
    require_complete_pool: bool = False,
) -> DataFrame:
    """Greedy MMR over per-query candidate pools.

    ``rel``: (q_id int, doc_id, rel double) — the pool with retrieval
    scores, pre-rounded. ``sims``: (q_id int, ad, bd, sim double) —
    pairwise similarities within each pool for ``ad != bd``,
    pre-rounded. Direction rule: the greedy takes the MAX over
    whichever of (candidate, chosen) / (chosen, candidate) is present
    and treats a fully absent pair as 0.0, so shipping one direction
    of a symmetric sim is sufficient for THIS operator. Callers pinned
    against the recursive-CTE oracle pattern must still ship BOTH
    directions: the oracle's inner join sees only (candidate→chosen)
    rows and drops a candidate with no present pair entirely (all
    in-repo callers ship both, so the engines agree). Returns
    (q_id, rank, doc_id, mmr): rank 1 is the pure-relevance anchor
    (its mmr IS its rel); ranks 2..k carry the marginal score. Pools
    smaller than ``k`` return their full size.

    ``require_complete_pool=True`` turns the oracle-parity invariant
    above into a RUNTIME check (ADVICE r15): each pool group must
    carry exactly ``n*(n-1)`` non-null directed sim pairs (both
    directions for every candidate pair, no pairs pointing outside
    the pool) or the task raises. Oracle-pinned callers pass it so a
    future pool builder that prunes pairs fails loudly instead of
    silently diverging from the recursive-CTE oracle's inner-join
    drop rule. The check is free at scale: it reads the (pool-
    bounded, <= N^2) rows already resident in the Arrow batch —
    no extra stage, no extra shuffle.
    """
    import pandas as pd

    payload = rel.join(
        sims,
        (rel["q_id"] == sims["q_id"]) & (rel["doc_id"] == sims["ad"]),
        "left",
    ).select(rel["q_id"], rel["doc_id"], rel["rel"], sims["bd"], sims["sim"])

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        q = int(pdf["q_id"].iloc[0])
        pool = (
            pdf[["doc_id", "rel"]]
            .drop_duplicates("doc_id")
            .sort_values(["rel", "doc_id"], ascending=[False, True])
        )
        rels = dict(zip(pool["doc_id"], pool["rel"]))
        sim = {}
        for a, b, s in zip(pdf["doc_id"], pdf["bd"], pdf["sim"]):
            if pd.notna(s):
                sim[(int(a), int(b))] = float(s)
        if require_complete_pool:
            # ADVICE r16: compare against the EXACT expected set, not the
            # count — an out-of-pool pair or a duplicated directed pair
            # (collapsed by the dict) could numerically cancel a missing
            # in-pool pair and slip past a pure len() check. The row count
            # additionally catches a duplicated in-pool pair (set-invisible
            # after the dict collapse). Still pool-bounded (<= N^2 tuples
            # on rows already in the Arrow batch) — no extra stage.
            #
            # KNOWN BLIND SPOT (ADVICE r17): this check sees only pairs
            # whose "a"-side doc survived the left join onto the pool —
            # a sims row whose a-side doc is OUTSIDE the pool never
            # reaches this batch, so out-of-pool enforcement is exact
            # for the b-side ("bd") but structurally blind on the
            # a-side. No oracle divergence (the recursive-CTE oracle's
            # inner join drops the same rows); full a-side enforcement
            # would need a sims-vs-pool anti-join BEFORE this stage,
            # which callers wanting it can do themselves.
            n = len(pool)
            ids = set(int(d) for d in pool["doc_id"])
            expected = {(a, b) for a in ids for b in ids if a != b}
            shipped = int(pd.notna(pdf["sim"]).sum())
            if set(sim) != expected or shipped != n * (n - 1):
                out_of_pool = sorted(set(sim) - expected)[:3]
                missing = sorted(expected - set(sim))[:3]
                raise ValueError(
                    f"mmr_rerank(require_complete_pool=True): pool for "
                    f"q_id={q} has {n} candidates; expected exactly the "
                    f"n*(n-1) = {n * (n - 1)} in-pool directed pairs but "
                    f"got {shipped} rows ({len(sim)} distinct) — "
                    f"missing={missing}, out_of_pool={out_of_pool} — the "
                    "caller pruned, duplicated, or shipped pairs outside "
                    "the pool, which diverges from the recursive-CTE "
                    "oracle's inner-join semantics"
                )
        # anchor: pure relevance, doc_id tie-break (pool is pre-sorted)
        first = int(pool["doc_id"].iloc[0])
        chosen = [first]
        out = [(q, 1, first, float(rels[first]))]
        remaining = set(int(d) for d in pool["doc_id"]) - {first}
        while remaining and len(chosen) < k:
            best = None
            for d in sorted(remaining):  # ascending: first win keeps low id
                # max over the present direction(s); absent pair -> 0.0
                max_sim = max(
                    max(sim.get((d, c), 0.0), sim.get((c, d), 0.0)) for c in chosen
                )
                score = lam * rels[d] - mu * max_sim
                if best is None or score > best[0]:
                    best = (score, d)
            score, d = best
            chosen.append(d)
            out.append((q, len(chosen), d, float(score)))
            remaining.discard(d)
        return pd.DataFrame(out, columns=["q_id", "rank", "doc_id", "mmr"])

    return payload.groupBy("q_id").applyInPandas(greedy, _OUT_SCHEMA)
