"""Iterative clustering (Lloyd's k-means) as DataFrame plans.

The IVF index (operators/similarity.py) quantizes against centroids; a
real deployment trains them. This is the engine's iterative-algorithm
pattern: each iteration is a pure DataFrame program (literal-inlined
zero-shuffle assign + re-average), driven by a small Python loop — the model state (k × dim
centroids) lives on the driver, the data never leaves executors. The
same loop shape serves any fixed-point algorithm (PageRank, label
propagation, IVF training).

Deterministic: init = first k vectors by id; ties break on centroid id.
Non-SQL-expressible (iteration), so consumers register rows-only; the
test asserts the Lloyd's invariant instead (inertia never increases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(df: DataFrame, centroid_rows: list[tuple[int, list[float]]], id_col: str, vec_col: str) -> DataFrame:
    """Nearest centroid per vector by squared L2 — ZERO-shuffle form.

    The model state (k × dim doubles) already lives on the driver, so
    instead of crossJoin(broadcast)+groupBy(argmin) — which ships every
    vector through the shuffle k times — the centroids are inlined as a
    literal array-of-structs and the argmin is one ``F.aggregate`` fold
    per row. Assignment becomes a pure projection: no exchange, no
    duplicate vector traffic, whole-stage codegen end to end. At 100 TB
    this is the difference between a k-fold shuffle per iteration and
    none at all (the only iteration shuffle left is the k-row partial
    aggregate in the stats step)."""
    from k8e_fetch_spark.functions.vectors import validate_finite_centroids

    validate_finite_centroids([(int(cid), [float(x) for x in vec]) for cid, vec in centroid_rows])
    # One SQL string -> ONE Py4J call. Building k x dim literals as
    # Column objects costs ~0.6 s of driver round trips per iteration;
    # the string form is free. (Driver-side latency, not a plan change.)
    cents = ",".join(
        f"named_struct('cid',{int(cid)},'c',array({','.join(f'{float(x)!r}D' for x in vec)}))"
        for cid, vec in centroid_rows
    )
    # one transform pass computes each distance exactly once; array_min
    # on (d2, cid) structs is the argmin with the documented cid
    # tie-break. Field extraction may inline the fold twice after
    # projection collapse — 2 x (k x dim) flops per row, no shuffle.
    best = F.expr(
        f"array_min(transform(array({cents}), cand -> named_struct("
        f"'d2', aggregate(zip_with(`{vec_col}`, cand.c, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, x) -> acc + x), "
        f"'cid', cand.cid)))"
    )
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        best["cid"].alias("centroid_id"),
        best["d2"].alias("d2"),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
    return_rounds: bool = False,
    local_threshold: int = 1 << 20,
) -> DataFrame | tuple[DataFrame, int]:
    """Connected components over an edge list — the step that turns
    near-duplicate PAIRS into dedup CLUSTERS (keep one doc per
    component). Iterative min-label propagation: every node repeatedly
    adopts the smallest label among itself and its neighbors until a
    fixpoint.

    Convergence bound: the minimum label travels one hop per round, so
    rounds needed = the component's diameter in hops from its min-id
    node, plus one fixpoint-detection round (a planted path graph in
    tests/test_clustering.py pins this exactly). The dedup stack's
    inputs keep that diameter small by construction: LSH mega buckets
    are star-linked to a min-id anchor (operators/similarity.py), which
    caps a boilerplate cluster's diameter at 2 regardless of its size,
    and organic near-dup clusters are shallow (2-3 rounds in practice).
    If ``max_iterations`` is reached before the fixpoint (a pathological
    deep chain), the returned labels are NOT converged — callers that
    cannot bound the diameter should pass ``return_rounds=True`` and
    check ``rounds < max_iterations``, or switch to
    :func:`connected_components_star` (large-star/small-star), which
    converges in O(log n) alternations on exactly those graphs and is
    equivalence-tested against this function.

    Each round is two DataFrame ops (join + min-aggregate) on the edge
    list; convergence is checked with a count of changed labels. Returns
    (node, component) where component = min node id in the component —
    or ``(labels, rounds_executed)`` with ``return_rounds=True``.
    """
    # Both edge directions from ONE pass over pairs (explode of a
    # 2-array), not a union of two selects: a union references the
    # pair-generation lineage twice, and when pairs come from the full
    # MinHash pipeline each reference re-runs the whole chain.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                    F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    # Job-count fuse (r10, the kmeans/BPE pattern): an edge list below
    # ``local_threshold`` collects ONCE (bounded probe — CollectLimit
    # short-circuits on a big graph) and the components come from
    # driver-side union-find with min-id relabeling — the SAME
    # converged answer the propagation loop reaches (both compute
    # component = min node id), without 2-3 jobs per round. Above the
    # threshold — any real near-dup graph; always at 100 TB — the
    # distributed loop below runs unchanged off the probe-materialized
    # lineage.
    # Arrow probe (toPandas, not collect): above-threshold graphs pay
    # only a columnar pull of threshold+1 narrow rows before falling
    # back to the distributed loop — the row-based collect() built a
    # million Python Row objects on exactly the graphs that then didn't
    # use them (measured ~15 s of pure waste at the 20x stress scale)
    probe = edges.limit(local_threshold + 1).toPandas()
    if len(probe) <= local_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(probe["src"].to_list(), probe["dst"].to_list()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        comp_min: dict = {}
        for n in parent:
            r = find(n)
            m = comp_min.get(r)
            if m is None or n < m:
                comp_min[r] = n
        rows_out = sorted((n, comp_min[find(n)]) for n in parent)
        from pyspark.sql import types as T

        node_type = edges.schema["src"].dataType  # callers use long OR string ids
        schema = T.StructType(
            [
                T.StructField("node", node_type),
                T.StructField("component", node_type),
            ]
        )
        out = pairs.sparkSession.createDataFrame(rows_out, schema)
        # union-find is EXACT in one pass — report rounds=0 so the
        # documented convergence check (rounds < max_iterations) reads
        # converged for every max_iterations >= 1. (ADVICE r10: the old
        # rounds=1 misread as unconverged when max_iterations == 1.)
        return (out, 0) if return_rounds else out

    # cut the (possibly expensive) pair-generation lineage ONCE: the
    # edge list is re-joined every round and would otherwise re-run the
    # whole upstream pipeline per iteration (measured 6x slower when the
    # edges come from the MinHash pipeline)
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    rounds = 0
    for _ in range(max_iterations):
        # ONE join + ONE aggregation per round: the node's own label
        # rides the union tagged with own=true, so the aggregation
        # yields the new min-label AND the previous label side by side —
        # no second join to detect changes (the old form's
        # per-round change-count join was half the iteration cost).
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "component", F.lit(False).alias("own"))
        )
        own_labels = labels.select("node", "component", F.lit(True).alias("own"))
        new_labels = (
            own_labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("own"), F.col("component"))).alias("_old"),
            )
        )
        # materialization barrier: without it each round's plan nests the
        # previous rounds (exponential lineage); localCheckpoint keeps
        # iteration cost linear. Cluster form: checkpoint to HDFS/S3.
        # The change count is a plain scan of the checkpointed result.
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("component") != F.col("_old")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            # the zero-change (fixpoint-detection) round is not counted:
            # a converged run must satisfy the documented check
            # rounds < max_iterations even when detection lands exactly
            # on the last allowed round (ADVICE r11 — the r10 contract
            # fix had only reached the union-find path's rounds=0).
            break
        rounds += 1
    return (labels, rounds) if return_rounds else labels


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 5,
    return_centroids: bool = False,
    use_arrow: bool | None = None,
    local_threshold: int = 16384,
) -> tuple[DataFrame, list[float]] | tuple[DataFrame, list[float], list[tuple[int, list[float]]]]:
    """Lloyd's k-means; returns (assignments DataFrame, inertia per
    iteration) — plus the trained centroid rows when
    ``return_centroids`` is set (the IVF training handoff: feed them to
    ``ivf_assign``/probe search). Centroids collect to the driver each
    step (k × dim doubles — bytes, not data); assignment is a
    zero-shuffle projection, so the only per-iteration exchange is the
    k-row map-side-combined stats aggregate. ONE job per iteration (the
    stats collect).

    Assignment path (r9): ``use_arrow=None`` auto-selects by model
    size — the measured crossover on this host is ~k x dim = 512
    doubles (k=8, dim=64: literal 2.1 s vs Arrow 2.6 s for the
    3-iteration pipeline at sf0.1, SAME at 20x — both flat; k=16:
    Arrow cuts semdedup's declared path 4.5 -> 3.1 s). Below the
    threshold the k x dim literal expression fold (:func:`_assign`)
    wins (no Python worker round trip); above it, the Arrow/numpy
    batch distance (functions/vectors.py:l2_assign_arrow) wins — the
    literal form costs ~0.9 s/iteration of driver expr build +
    analysis + codegen at k=16 dim=64 and grows with k, the Arrow
    closure is O(1) plan build. Same twin discipline as ivf_assign:
    assignments pinned identical on the fixtures
    (tests/test_clustering.py), d2 feeds only inertia telemetry."""
    from k8e_fetch_spark.io import fan_out

    from k8e_fetch_spark.functions.vectors import (
        l2_assign_arrow,
        validate_finite_centroids,
    )

    # Job-count fuse (r10): the Lloyd loop is inherently sequential —
    # one stats job per iteration — which at small input is pure
    # scheduling floor (per-job cost dwarfs per-row work). Below
    # ``local_threshold`` rows the trainer collects the corpus ONCE
    # (<= threshold x dim doubles) and runs the SAME deterministic
    # Lloyd math in numpy on the driver: identical init (first k by
    # id), identical argmin tie rule (first occurrence == smaller
    # centroid id), identical empty-cluster rule (keep old centroid) —
    # centroids agree with the distributed loop to float fold order,
    # the same ulp class the cross-engine oracles already absorb
    # (pinned equal-assignment in tests/test_clustering.py). The
    # returned DataFrame is still the distributed zero-shuffle
    # projection, under the same pre-final-update centroids the
    # distributed loop returns it under. Above the threshold — always
    # at real scale — CollectLimit short-circuits after threshold+1
    # rows and the distributed per-iteration loop runs unchanged
    # (train_centroids_sampled remains the sampled 100 TB path).
    # toPandas, not collect(): the probe moves rows x dim doubles and
    # Arrow batches them columnar — the row-based collect() built 40k
    # Python Row objects and dominated the 20x wall (6.3x vs flat)
    probe = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        .limit(local_threshold + 1)
        .toPandas()
    )
    if len(probe) == 0:
        raise ValueError("k-means init: input has no rows")

    if len(probe) <= local_threshold:
        import numpy as np

        probe = probe.sort_values(id_col, kind="mergesort")
        X = np.stack(probe[vec_col].to_numpy()).astype(np.float64, copy=False)
        dim = X.shape[1]
        if use_arrow is None:
            use_arrow = k * dim > 512  # measured crossover; see docstring
        C = X[: min(k, len(X))].copy()  # init: first k by id
        inertia_history_local: list[float] = []
        last_cents = [(i, [float(x) for x in C[i]]) for i in range(len(C))]
        # |x-c|^2 = |x|^2 + |c|^2 - 2 x.c via BLAS matmul — the
        # elementwise (X[:,None,:]-C)**2 broadcast materializes an
        # n x k x dim temp three times per iteration (9.7 s for three
        # iterations at n=40k; the matmul form is ~100x). Numerics:
        # the expansion differs from the elementwise form at ~1e-12
        # relative — an assignment flip needs a near-exact centroid
        # tie, the same margin class every twin in this module already
        # carries; d2 itself feeds only inertia telemetry here (the
        # RETURNED assignment's d2 comes from the unchanged
        # literal/Arrow projection below).
        Xn = np.einsum("ij,ij->i", X, X)
        for _ in range(iterations):
            Cn = np.einsum("ij,ij->i", C, C)
            d2l = Xn[:, None] + Cn[None, :] - 2.0 * (X @ C.T)
            jl = np.argmin(d2l, axis=1)
            inertia_history_local.append(
                float(np.maximum(d2l[np.arange(len(jl)), jl], 0.0).sum())
            )
            last_cents = [(i, [float(x) for x in C[i]]) for i in range(len(C))]
            for cid in range(len(C)):
                members = X[jl == cid]
                if len(members):
                    C[cid] = members.mean(axis=0)
        centroid_rows = [(i, [float(x) for x in C[i]]) for i in range(len(C))]

        vecs_local = fan_out(
            df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        )
        if not use_arrow:
            assigned_local = _assign(vecs_local, last_cents, id_col, vec_col)
        else:
            validate_finite_centroids(last_cents)
            al = l2_assign_arrow(last_cents)(F.col(vec_col))
            assigned_local = vecs_local.select(
                F.col(id_col),
                F.col(vec_col),
                al["centroid_id"].alias("centroid_id"),
                al["d2"].alias("d2"),
            )
        result_local = assigned_local.select(id_col, "centroid_id", "d2")
        if return_centroids:
            return result_local, inertia_history_local, centroid_rows
        return result_local, inertia_history_local

    # single-split parquet arrives as 1 partition; the assignment
    # projection would serialize on one core. Widen once, cache: every
    # iteration re-reads this exact frame.
    from k8e_fetch_spark.functions.caching import persist_scoped

    vecs = persist_scoped(
        "kmeans.vecs",
        fan_out(
            df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
        ),
    )
    init = (
        vecs.orderBy(id_col)
        .limit(k)
        .collect()
    )
    dim = len(init[0][vec_col])  # from the init collect — no extra probe job
    centroid_rows = [(i, list(r[vec_col])) for i, r in enumerate(init)]

    if use_arrow is None:
        use_arrow = k * dim > 512  # measured crossover; see docstring

    def _assign_rows(rows: list[tuple[int, list[float]]]) -> DataFrame:
        if not use_arrow:
            return _assign(vecs, rows, id_col, vec_col)
        # same fail-fast as the literal twin: non-finite centroids mean
        # upstream corruption (empty-cluster average, bad embeddings)
        validate_finite_centroids(
            [(int(cid), [float(x) for x in vec]) for cid, vec in rows]
        )
        a = l2_assign_arrow(rows)(F.col(vec_col))
        return vecs.select(
            F.col(id_col),
            F.col(vec_col),
            a["centroid_id"].alias("centroid_id"),
            a["d2"].alias("d2"),
        )

    inertia_history: list[float] = []
    assigned = None
    for _ in range(iterations):
        assigned = _assign_rows(centroid_rows)
        # Narrow stats shape: posexplode to (cid, pos, x) rows, then one
        # map-side-combined aggregate; k x dim result rows collect. Keeps
        # the plan at ~5 expressions instead of 2 x dim projected/agg
        # columns (driver analysis time), same single job per iteration.
        # d2 repeats once per pos, so per-centroid inertia/count are read
        # off the pos==0 rows exactly (no division, no drift).
        stats = (
            assigned.select("centroid_id", "d2", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.avg("x").alias("m"),
                F.sum("d2").alias("sd2"),
            )
            .collect()
        )
        inertia_history.append(float(sum(r["sd2"] for r in stats if r["pos"] == 0)))
        means: dict[int, list[float | None]] = {}
        for r in stats:
            means.setdefault(r["centroid_id"], [None] * dim)[r["pos"]] = float(r["m"])
        centroid_rows = [
            (cid, means[cid] if cid in means else vec) for cid, vec in centroid_rows
        ]
    result = assigned.select(id_col, "centroid_id", "d2")
    if return_centroids:
        return result, inertia_history, centroid_rows
    return result, inertia_history


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
    return_rounds: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the log-rounds upgrade path :func:`connected_components` documents
    for graphs whose diameter is NOT small: min-label propagation needs
    diameter rounds (a 1M-hop chain = 1M rounds); star contraction
    halves long paths every alternation, converging in O(log n) rounds
    on pathological graphs and matching min-label everywhere.

    Each half-round is buffer-bounded: per-node neighborhood minima come
    from a map-side-combined ``min`` aggregation joined back to the edge
    list (never a collected neighbor list), so a 100M-degree hub costs a
    fixed-size buffer. Each round materializes ONE checkpointed frame
    that carries both the new edge set and the old-set membership tags,
    so the fixpoint probe (any edge whose old/new membership differs) is
    a scan of already-materialized local blocks, not a second pass over
    the edge set — the same one-action-per-round shape as min-label's
    fused change count. Convergence = the normalized edge set reaching a
    fixpoint (star edges only). Returns (node, component) with
    component = min node id, identical to :func:`connected_components`.

    If ``max_iterations`` is exhausted before the fixpoint, residual
    non-star edges could label a node twice; labels are then deduped
    with a per-node min-aggregate (best-effort, same caveat as
    min-label's unconverged return) and a RuntimeWarning is raised —
    callers that need certainty pass ``return_rounds=True`` and check
    ``rounds < max_iterations``.
    """
    # symmetric edge list, self-loops dropped
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
                    F.struct(F.col(b_col).alias("u"), F.col(a_col).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = edges.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=True)

    rounds = 0
    changed = 0
    for _ in range(max_iterations):
        # ---- large-star: every neighbor v > u links to m(u) ----------
        sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        ls = (
            sym.join(mins, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star on the large→small orientation ---------------
        directed = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = directed.groupBy("u").agg(F.min("v").alias("m"))
        j = directed.join(mins2, on="u")
        new_raw = (
            j.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select(F.col("u"), F.col("m").alias("v")))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # Fused fixpoint probe: tag new rows and (normalized) old rows,
        # then ONE groupBy(u, v) both dedupes the new edge set (the
        # distinct this pipeline needs anyway — same shuffle) and
        # records old-set membership. The checkpoint is the round's
        # single full-compute action; the change probe and the next
        # round's edge scan read its local blocks.
        tagged = new_raw.select(
            "u", "v", F.lit(1).alias("in_new"), F.lit(0).alias("in_old")
        ).unionByName(
            edges.select(
                F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"),
                F.lit(0).alias("in_new"),
                F.lit(1).alias("in_old"),
            )
        )
        merged = (
            tagged.groupBy("u", "v")
            .agg(F.max("in_new").alias("in_new"), F.max("in_old").alias("in_old"))
            .localCheckpoint(eager=True)
        )
        changed = (
            merged.filter(F.col("in_new") != F.col("in_old")).limit(1).count()
        )
        edges = merged.filter(F.col("in_new") == 1).select("u", "v")
        if changed == 0:
            # zero-change round not counted — same convergence-check
            # contract as the min-label loop (rounds < max_iterations
            # must hold for every converged run, ADVICE r11)
            break
        rounds += 1

    # converged: edges are (member -> root) stars; roots label themselves
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    if changed != 0:
        # max_iterations exhausted: residual non-star edges can carry a
        # node under two targets — collapse to the smallest so the
        # output is at least one-row-per-node (best effort, warned).
        import warnings

        warnings.warn(
            f"connected_components_star did not converge in {rounds} "
            "rounds; returning per-node min labels (may split true "
            "components)",
            RuntimeWarning,
            stacklevel=2,
        )
        labels = labels.groupBy("node").agg(F.min("component").alias("component"))
    roots = all_nodes.join(labels, on="node", how="left_anti").select(
        "node", F.col("node").alias("component")
    )
    out = labels.unionByName(roots)
    return (out, rounds) if return_rounds else out


def train_centroids_sampled(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 8,
    sample_size: int = 2048,
) -> list[tuple[int, list[float]]]:
    """Train k-means centroids on a BOUNDED driver sample (numpy Lloyd)
    — the production quantizer-training pattern (FAISS trains coarse/PQ
    codebooks on a sample on one machine; sim_topk_pq_trained uses the
    same shape for its subspace codebooks). Driver state is
    sample_size x dim + k x dim doubles regardless of corpus size —
    the documented O(k) contract that lets k scale with n (SemDeDup
    and IVF both need cluster count ~ n/target at 100 TB, where the
    full-corpus kmeans() loop's per-iteration literal-inlined assign
    stops being practical past a few dozen centroids).

    Deterministic: fixed sample (first ``sample_size`` by id), first-k
    init, L2 argmin with numpy's lower-index tie, mean update, empty
    clusters carry the previous centroid."""
    import numpy as np

    sample = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    X = np.array([r["v"] for r in sample], dtype=np.float64)
    if len(X) < k:
        raise ValueError(
            f"centroid training: {len(X)} sample vectors, need at least k={k}"
        )
    cents = X[:k].copy()
    for _ in range(iterations):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return [(j, [float(v) for v in cents[j]]) for j in range(k)]


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    eps: float = 0.95,
    iterations: int = 2,
    train_sample: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    corpus, then within each cluster drop every item with cosine
    >= ``eps`` to an already-ranked cluster-mate, where rank ascends by
    similarity to the centroid (ties to the smaller id) — the paper's
    keep-the-least-centroid-similar retention rule, applied as the
    released implementation's upper-triangular similarity-matrix test
    (an earlier-ranked neighbor suppresses you whether or not it was
    itself dropped).

    Returns one row per input vector:
    (id_col, cluster_id int, centroid_sim double, kept int).

    Training: ``train_sample=None`` runs the full-corpus kmeans() loop
    (deterministic, SQL-unrollable for fixed iterations — the declared
    query's oracle-able path, right for modest k); an int trains on
    that bounded driver sample instead (train_centroids_sampled) —
    the 100 TB path, where k must scale ~ n/target_cluster_size to keep
    the within-cluster pairwise stage (the paper's own O(n^2/k))
    per-task-bounded. Assignment and the dedup pipeline are identical
    either way: Arrow coarse assign (zero shuffle), one rank window on
    the cluster id, the pairwise stage a self-join on the cluster id
    with cosines batched through BLAS (cosine_arrow), round(cos, 6)
    before the eps compare so cross-engine float fold order cannot
    flip a boundary pair."""
    from pyspark.sql import Window

    from k8e_fetch_spark.functions.rounding import round_fixed
    from k8e_fetch_spark.functions.vectors import (
        coarse_assign_with_sim_arrow,
        cosine_arrow,
    )

    if train_sample is not None:
        cent_rows = train_centroids_sampled(
            df, id_col, vec_col, k=k, iterations=iterations, sample_size=train_sample
        )
    else:
        _assigned, _hist, cent_rows = kmeans(
            df, id_col, vec_col, k=k, iterations=iterations, return_centroids=True
        )
    # centroids are driver state (k x dim doubles): assignment and the
    # centroid cosine fuse into ONE scan-local Arrow projection — no
    # centroid createDataFrame/collect round trip, no broadcast join
    # (two scheduled jobs saved; the math twins the ivf_assign +
    # cosine_arrow forms it replaces, see coarse_assign_with_sim_arrow)
    a = coarse_assign_with_sim_arrow(cent_rows)(F.col(vec_col))
    withsim = df.select(
        F.col(id_col),
        F.col(vec_col),
        a["centroid_id"].alias("centroid_id"),
        a["csim"].alias("csim"),
    )
    w = Window.partitionBy("centroid_id").orderBy(F.asc("csim"), F.asc(id_col))
    # NOTE (r10): ranked feeds both self-join sides and the final
    # keep/drop join; an explicit persist here measured SLOWER than
    # letting ReusedExchange deduplicate the window subplan (2.7 s vs
    # 1.8 s warm at sf0.1) — do not re-add it.
    ranked = withsim.withColumn("rn", F.row_number().over(w)).select(
        "centroid_id", id_col, vec_col, "csim", "rn"
    )
    lhs = ranked.select(
        "centroid_id",
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_emb"),
        F.col("rn").alias("a_rn"),
    )
    rhs = ranked.select(
        "centroid_id",
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_emb"),
        F.col("rn").alias("b_rn"),
    )
    dropped = (
        lhs.join(rhs, on="centroid_id")
        .filter(F.col("b_rn") < F.col("a_rn"))
        .filter(round_fixed(cosine_arrow(F.col("a_emb"), F.col("b_emb")), 6) >= eps)
        .select(F.col("a_id").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(1))
    )
    return ranked.join(dropped, on=id_col, how="left").select(
        id_col,
        F.col("centroid_id").cast("int").alias("cluster_id"),
        F.col("csim").alias("centroid_sim"),
        F.when(F.col("_dropped").isNull(), 1).otherwise(0).cast("int").alias("kept"),
    )
