"""Extended relational coverage (ext-typed-relational, SURVEY.md §2.6).

Operators beyond the reference's surface that a complete analytics
engine must carry: as-of joins, range (non-equi) joins, CUBE grouping
sets, semi/anti joins, percentiles, pivot, calendar rollups, string
transforms. Every query is a pure DataFrame plan with a DuckDB oracle;
conventions per queries/registry.py (identical aliases, both-side
rounding, unique-key tie-breaks).

Scale notes: the non-equi joins here broadcast their small side
deliberately (band/dimension tables); semi/anti joins shuffle on the
join key only (no payload); CUBE is one shuffle with grouping-set
expansion map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k8e_fetch_spark.functions.rounding import round_fixed, sql_round
from k8e_fetch_spark.io import load
from k8e_fetch_spark.queries.registry import register


@register(
    "join_asof_purchase",
    oracle="""
        SELECT event_id, user_id, ts, last_purchase_ts FROM (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
            FROM events
        ) WHERE event_type = 'click'
    """,
    tags=("ext-typed-relational", "asof-join"),
)
def join_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the timestamp of the same user's
    most recent STRICTLY EARLIER purchase. Implemented as a single
    event-time window (last_value ignoreNulls over rows preceding) —
    one shuffle on user_id, no self-join, no range explosion; the
    standard scalable as-of formulation."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return (
        events.withColumn("last_purchase_ts", F.last(purchase_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )


_BANDS = [(0, 100_000), (100_000, 200_000), (200_000, 300_000), (300_000, 500_000)]
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT {i} AS band_id, {lo} AS lo, {hi} AS hi" for i, (lo, hi) in enumerate(_BANDS)
)


@register(
    "join_range_price_bands",
    oracle=f"""
        WITH bands AS ({_BANDS_SQL})
        SELECT band_id, count(*) AS n_orders,
               {sql_round('sum(o_totalprice)', 2)} AS total
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band_id
    """,
    tags=("ext-typed-relational", "range-join"),
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: orders into price bands. The band table is
    tiny and broadcast, so the non-equi predicate evaluates scan-local
    (BroadcastNestedLoopJoin over 4 rows) — never a shuffled theta
    join."""
    orders = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(_BANDS)],
        "band_id int, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round_fixed(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "cube_orders",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               {sql_round('sum(o_totalprice)', 2)} AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("ext-typed-relational", "cube"),
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping id — all 4 grouping
    sets in ONE shuffle (map-side grouping-set expansion), not 4 scans."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        round_fixed(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "join_semi_customers",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("ext-typed-relational", "semi-join"),
)
def join_semi_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order.
    Only the join key shuffles; no payload duplication, no post-dedup."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_customers",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("ext-typed-relational", "anti-join"),
)
def join_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered — the
    same primitive the Compress merge uses (op-insert-ignore)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "agg_percentiles",
    oracle=f"""
        SELECT o_orderpriority,
               {sql_round('quantile_cont(o_totalprice, 0.5)', 4)} AS p50,
               {sql_round('quantile_cont(o_totalprice, 0.9)', 4)} AS p90,
               {sql_round('quantile_cont(o_totalprice, 0.99)', 4)} AS p99
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("ext-typed-relational", "percentiles"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). At 100 TB swap for approx_percentile and
    drop the oracle to a tolerance check — noted, not silently done."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        round_fixed(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        round_fixed(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        round_fixed(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "pivot_event_types",
    oracle="""
        SELECT user_id,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'view') AS view,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'error') AS error,
               count(*) FILTER (event_type = 'signup') AS signup
        FROM events
        GROUP BY user_id
    """,
    tags=("ext-typed-relational", "pivot"),
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns. Explicit pivot
    values — no extra distinct-values job, single shuffle."""
    events = load(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "error", "signup"]
    out = (
        events.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for absent combos; oracle's FILTER yields 0
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@register(
    "orders_by_month",
    oracle=f"""
        SELECT date_trunc('month', o_orderdate) AS month,
               count(*) AS n_orders,
               {sql_round('sum(o_totalprice)', 2)} AS total
        FROM orders
        GROUP BY 1
    """,
    tags=("ext-typed-relational", "date-fns"),
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: month truncation + aggregates (the partition key
    a production table would use — this query IS the partition-pruning
    access pattern)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_fixed(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "agg_approx_sketches",
    oracle=None,  # sketch outputs differ across engines by design
    tags=("ext-typed-relational", "sketch", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB substitutes for their exact twins:
    HLL++ count-distinct and KLL-style approx percentiles, one pass, no
    full shuffle of distinct values. Rows-only here (sketches are
    engine-specific by design); tests/test_scale.py asserts each lands
    within tolerance of the exact answers."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_p50"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "string_funcs_parts",
    oracle="""
        SELECT p_partkey,
               upper(p_brand) AS brand_uc,
               substring(p_name, 1, 8) AS name_prefix,
               CAST(length(p_name) AS INTEGER) AS name_len,
               CAST(contains(p_type, 'ECO') AS BOOLEAN) AS is_economy,
               regexp_extract(p_brand, '[0-9]+', 0) AS brand_num
        FROM part
    """,
    tags=("ext-typed-relational", "string-fns"),
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage: case, substring, length, contains,
    regexp extraction — all scan-local codegen expressions."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.col("p_type").contains("ECO").alias("is_economy"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
    )
