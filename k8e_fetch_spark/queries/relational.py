"""ext-typed-relational: the standard relational layer (SURVEY.md §2.6).

The reference has no joins/aggregates/windows (§2.5) — this is the
engine's own query surface over the typed star schema: joins, group-by
aggregates, window functions, sort/top-k, set ops, rollup, JSON scalars.

Scale design notes (100 TB):
- dimension joins (region/nation/customer/supplier) are broadcast —
  Spark auto-broadcasts under the threshold; fact-fact joins shuffle on
  the join key and AQE handles skew;
- aggregates are partial (map-side combine) before the shuffle;
- every top-k sorts on a bounded key set AFTER aggregation (TakeOrdered,
  no global sort of the fact table);
- float aggregates are rounded in-query on both engines with
  arithmetic rounding (functions/rounding.py): sum order is
  engine-dependent, low-order bits are not semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from k8e_fetch_spark.functions.rounding import round_fixed, sql_round
from k8e_fetch_spark.io import load
from k8e_fetch_spark.queries.registry import register

_Q1_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           {sql_round('sum(l_quantity)', 2)} AS sum_qty,
           {sql_round('sum(l_extendedprice)', 2)} AS sum_base_price,
           {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
           {sql_round('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
           {sql_round('avg(l_quantity)', 4)} AS avg_qty,
           {sql_round('avg(l_extendedprice)', 4)} AS avg_price,
           {sql_round('avg(l_discount)', 4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", oracle=_Q1_ORACLE, tags=("ext-typed-relational", "groupby-agg"))
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filtered scan -> partial+final
    hash aggregate on a 6-value grouping key. The filter pushes to the
    parquet scan; the shuffle carries only per-group partials."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_fixed(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_fixed(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_fixed(F.sum(disc_price), 2).alias("sum_disc_price"),
            round_fixed(F.sum(charge), 2).alias("sum_charge"),
            round_fixed(F.avg("l_quantity"), 4).alias("avg_qty"),
            round_fixed(F.avg("l_extendedprice"), 4).alias("avg_price"),
            round_fixed(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q3_ORACLE = f"""
    SELECT l_orderkey,
           {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register("tpch_q3_shipping_priority", oracle=_Q3_ORACLE, tags=("ext-typed-relational", "join", "topk"))
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: selective dimension filter
    (customer, broadcast) -> fact join -> aggregate -> top-k. Ordering
    uses the ROUNDED revenue + unique key so the LIMIT keeps the same
    rows on both engines."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round_fixed(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = f"""
    SELECT n_name,
           {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


@register("tpch_q5_local_supplier", oracle=_Q5_ORACLE, tags=("ext-typed-relational", "join", "star-join"))
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue: five-way star join. All
    dimensions broadcast; the only shuffle is the fact-side aggregate.
    The region filter prunes nations before they ever reach the fact."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey) & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(round_fixed(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


_TOPCUST_ORACLE = f"""
    SELECT c_custkey, c_name,
           count(*) AS order_count,
           {sql_round('sum(o_totalprice)', 2)} AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey
    LIMIT 20
"""


@register("top_customers_by_revenue", oracle=_TOPCUST_ORACLE, tags=("ext-typed-relational", "join", "topk"))
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after aggregation: aggregate orders on the fact side FIRST
    (shuffle carries one row per customer), then broadcast-join the
    customer dim, then TakeOrdered top-20 — never a global sort."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        round_fixed(F.sum("o_totalprice"), 2).alias("total_spend"),
    )
    return (
        per_cust.join(F.broadcast(customer), per_cust.o_custkey == customer.c_custkey)
        .select("c_custkey", "c_name", "order_count", "total_spend")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(20)
    )


_WINDOW_ORACLE = f"""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
               {sql_round('''sum(o_totalprice) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey
                                             ROWS UNBOUNDED PRECEDING)''', 2)} AS running_spend
        FROM orders
    ) WHERE price_rank <= 2
"""


@register("window_order_rank", oracle=_WINDOW_ORACLE, tags=("ext-typed-relational", "window"))
def window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: rank + running sum per customer partition.
    One shuffle on the partition key serves both windows; orderings
    include unique keys so ranks are deterministic."""
    orders = load(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rank).alias("price_rank"),
            round_fixed(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
        )
        .filter(F.col("price_rank") <= 2)
    )


@register(
    "set_ops_customers",
    oracle="""
        SELECT 'open_and_closed' AS tag, o_custkey AS custkey FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
        UNION ALL
        SELECT 'pending_not_closed' AS tag, o_custkey AS custkey FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
    """,
    tags=("ext-typed-relational", "setops"),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: INTERSECT / EXCEPT (distinct forms), tagged and
    unioned into one result."""
    orders = load(spark, sf_dir, "orders")

    def by_status(s: str) -> DataFrame:
        return orders.filter(F.col("o_orderstatus") == s).select("o_custkey")

    both = by_status("O").intersect(by_status("F")).select(
        F.lit("open_and_closed").alias("tag"), F.col("o_custkey").alias("custkey")
    )
    pending = by_status("P").distinct().subtract(by_status("F").distinct()).select(
        F.lit("pending_not_closed").alias("tag"), F.col("o_custkey").alias("custkey")
    )
    return both.unionByName(pending)


_ROLLUP_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           {sql_round('sum(l_quantity)', 2)} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem", oracle=_ROLLUP_ORACLE, tags=("ext-typed-relational", "rollup"))
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregates: ROLLUP produces per-group, per-flag and
    grand-total rows in one pass (Spark expands grouping sets in a
    single shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        round_fixed(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


_AGGSTATS_ORACLE = f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(DISTINCT l_partkey) AS n_parts,
           {sql_round('avg(l_discount)', 6)} AS avg_disc,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship,
           {sql_round('sum(l_quantity)', 2)} AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
"""


@register("agg_statistics", oracle=_AGGSTATS_ORACLE, tags=("ext-typed-relational", "groupby-agg", "count-distinct"))
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate breadth: count, exact distinct count (expand+two-phase
    in Spark), avg, min/max over timestamps, sum."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        round_fixed(F.avg("l_discount"), 6).alias("avg_disc"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        round_fixed(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


_JSON_ORACLE = f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
           {sql_round("avg(CAST(json_extract_string(props, '$.k') AS INTEGER))", 4)} AS k_avg
    FROM events
    GROUP BY event_type
"""


@register("events_json_extract", oracle=_JSON_ORACLE, tags=("ext-typed-relational", "json"))
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events payload column
    (get_json_object = JVM-side JSON path, no Python in the hot path)."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("k_sum"),
        round_fixed(F.avg(k), 4).alias("k_avg"),
    )


_MAP_ORACLE = """
    WITH per AS (
        SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
    ),
    nt AS (SELECT user_id, CAST(count(*) AS INTEGER) AS n_types FROM per GROUP BY 1)
    SELECT p.user_id AS user_id, n_types, event_type, cnt
    FROM per p JOIN nt ON p.user_id = nt.user_id
    WHERE cnt > 15
"""


@register("map_funcs_events", oracle=_MAP_ORACLE, tags=("ext-typed-relational", "map-fns"))
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType breadth — the metadata shape of real LLM-pipeline records
    (tags, source attributes, per-modality counters). Builds a per-user
    map of event-type counts (``map_from_entries`` over a collected
    struct list), measures it (``size``), filters entries with a map
    lambda (``map_filter``), and explodes the map back to rows — all
    JVM-side higher-order map functions, no UDF. The oracle expresses
    the same semantics relationally."""
    events = load(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    maps = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    hot = maps.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.explode(F.map_filter("m", lambda k, v: v > 15)).alias("event_type", "cnt"),
    )
    return hot.select("user_id", "n_types", "event_type", "cnt")


_Q10_ORACLE = f"""
    SELECT c.c_custkey, c.c_name,
           {sql_round("sum(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@register("tpch_q10_returned_items", oracle=_Q10_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item report: who returned the most
    revenue last quarter. Fact-side filters (date window, returnflag)
    reach the scans; customer/nation broadcast; one aggregate shuffle;
    top-20 via TakeOrderedAndProject (revenue rounded BEFORE ordering so
    the cutoff set matches the oracle's bit-for-bit)."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            round_fixed(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


_Q6_ORACLE = f"""
    SELECT {sql_round('sum(l_extendedprice * l_discount)', 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue change: the purest pushdown probe in
    the suite — three scan-level predicates, zero joins, one global
    aggregate. All three filters (date range, discount band, quantity
    cap) must reach the parquet scan as PushedFilters; the aggregate is
    a single partial+final pair over one row of state."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_fixed(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q4_ORACLE = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
"""


@register("tpch_q4_order_priority", oracle=_Q4_ORACLE, tags=("ext-typed-relational", "tpch", "semi-join"))
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check, adapted to this schema (no
    l_commitdate column): count orders in a quarter having at least one
    line item shipped after the order date. The EXISTS becomes a
    LEFT SEMI join — Spark's dedicated semi-join operator keeps the
    probe side unduplicated (no distinct needed) and the orders-side
    date filter still pushes to the scan."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        how="left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q13_ORACLE = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey AS custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
"""


@register("tpch_q13_customer_distribution", oracle=_Q13_ORACLE, tags=("ext-typed-relational", "tpch", "outer-join"))
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style customer order-count distribution, adapted (the
    original excludes orders by comment pattern; this schema has no
    o_comment, so the exclusion predicate is on o_orderpriority).
    Exercises the outer-join-with-join-side-predicate shape — the
    filter belongs in the JOIN CONDITION, not a WHERE (a WHERE would
    silently drop the zero-order customers the query exists to count)
    — plus a two-level aggregation."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            how="left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q14_ORACLE = f"""
    SELECT {sql_round(
        "100.0 * sum(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ sum(l_extendedprice * (1 - l_discount))", 4)} AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
"""


@register("tpch_q14_promo_effect", oracle=_Q14_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (p_type here is a plain category, so
    the match is equality rather than LIKE 'PROMO%'): conditional
    aggregation over a fact-dimension join. The part side broadcasts;
    the month filter pushes to the lineitem scan; one row out."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            round_fixed(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


_Q18_ORACLE = f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_round('sum(l.l_quantity)', 2)} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 25
"""


@register("tpch_q18_large_volume", oracle=_Q18_ORACLE, tags=("ext-typed-relational", "tpch", "having"))
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: the IN-subquery-with-HAVING
    shape. The big-order keyset is computed once (aggregate + filter)
    and semi-joined into the fact flow; at scale that keyset is tiny
    relative to lineitem, so AQE turns the semi join into a broadcast.
    Top-25 via rounded total + unique orderkey tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), on="o_orderkey", how="left_semi"
    )
    customer = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(round_fixed(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


_Q22_ORACLE = f"""
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           {sql_round('sum(c_acctbal)', 2)} AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c_acctbal > (
        SELECT avg(c_acctbal) FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
"""


@register("tpch_q22_sales_opportunity", oracle=_Q22_ORACLE, tags=("ext-typed-relational", "tpch", "anti-join"))
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style global sales opportunity, adapted (no c_phone
    column: the country-code prefix test becomes a c_nationkey set).
    Composes the suite's two remaining decorrelation shapes in one
    query: a scalar subquery (above-average account balance, computed
    once and broadcast as a literal predicate) and a NOT EXISTS
    anti-join against RECENT orders (Q22's "no orders in the window" =
    lapsed customers; the fixture has every customer ordering at least
    once overall, so the unwindowed anti side was vacuously empty —
    caught by the r10 non-vacuous sweep)."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    customer = load(spark, sf_dir, "customer")
    in_set = customer.filter(F.col("c_nationkey").isin(nations))
    # scalar subquery: one tiny aggregate, joined as a 1-row broadcast
    avg_bal = in_set.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        in_set.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), how="left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_fixed(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
