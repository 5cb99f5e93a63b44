"""Iterative clustering (Lloyd's k-means) as DataFrame plans.

The IVF index (operators/similarity.py) quantizes against centroids; a
real deployment trains them. This is the engine's iterative-algorithm
pattern: each iteration is a pure DataFrame program (broadcast-assign +
re-average), driven by a small Python loop — the model state (k × dim
centroids) lives on the driver, the data never leaves executors. The
same loop shape serves any fixed-point algorithm (PageRank, label
propagation, IVF training).

Deterministic: init = first k vectors by id; ties break on centroid id.
Non-SQL-expressible (iteration), so consumers register rows-only; the
test asserts the Lloyd's invariant instead (inertia never increases).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assign(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest centroid per vector by squared L2 — broadcast the (tiny)
    centroid table; argmin via min(struct(d2, centroid_id)) with the
    vector carried through the group (identical across a vector's k
    scored rows), so ONE shuffle per iteration and no join-back."""
    sq_dist = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = df.crossJoin(F.broadcast(centroids)).select(
        id_col, vec_col, "centroid_id", sq_dist.alias("d2")
    )
    return scored.groupBy(id_col).agg(
        F.min(F.struct("d2", "centroid_id")).alias("_b"),
        F.first(vec_col).alias(vec_col),
    ).select(
        id_col,
        vec_col,
        F.col("_b.centroid_id").alias("centroid_id"),
        F.col("_b.d2").alias("d2"),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over an edge list — the step that turns
    near-duplicate PAIRS into dedup CLUSTERS (keep one doc per
    component). Iterative min-label propagation: every node repeatedly
    adopts the smallest label among itself and its neighbors until a
    fixpoint; rounds needed = graph diameter (near-dup clusters are
    shallow, so this converges in 2-3 rounds in practice).

    Each round is two DataFrame ops (join + min-aggregate) on the edge
    list; convergence is checked with a count of changed labels. Returns
    (node, component) where component = min node id in the component.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
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
    for _ in range(max_iterations):
        neighbor_labels = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        # materialization barrier: without it each round's plan nests the
        # previous rounds (exponential lineage); localCheckpoint keeps
        # iteration cost linear. Cluster form: checkpoint to HDFS/S3.
        labels = labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 5,
) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means; returns (assignments DataFrame, inertia per
    iteration). Centroids collect to the driver each step (k × dim
    doubles — bytes, not data); assignment/averaging stay distributed."""
    spark: SparkSession = df.sparkSession
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    init = (
        vecs.orderBy(id_col)
        .limit(k)
        .collect()
    )
    dim = len(init[0][vec_col])  # from the init collect — no extra probe job
    centroid_rows = [(i, list(r[vec_col])) for i, r in enumerate(init)]

    inertia_history: list[float] = []
    assigned = None
    for _ in range(iterations):
        centroids = spark.createDataFrame(
            centroid_rows, f"centroid_id int, centroid array<double>"
        )
        assigned = _assign(vecs, centroids, id_col, vec_col)
        stats = (
            assigned.select(
                "centroid_id",
                "d2",
                *[F.element_at(F.col(vec_col), i + 1).alias(f"c{i}") for i in range(dim)],
            )
            .groupBy("centroid_id")
            .agg(
                F.sum("d2").alias("inertia"),
                F.count(F.lit(1)).alias("n"),
                *[F.avg(f"c{i}").alias(f"m{i}") for i in range(dim)],
            )
            .collect()
        )
        inertia_history.append(float(sum(r["inertia"] for r in stats)))
        by_id = {r["centroid_id"]: r for r in stats}
        centroid_rows = [
            (
                cid,
                [float(by_id[cid][f"m{i}"]) for i in range(dim)] if cid in by_id else vec,
            )
            for cid, vec in centroid_rows
        ]
    return assigned.select(id_col, "centroid_id", "d2"), inertia_history
