"""ext-typed-relational: the remaining TPC-H adaptations (q2 q7 q8 q9
q11 q12 q15 q16 q17 q19 q20 q21), completing the 22-query suite.

The reference (497 LoC of bash/YAML/sed, no query engine of its own —
/root/reference/bin/fetcher.bash) defines no relational surface; this
suite is the engine's own §2.6 typed-relational capability, exercised
through the full breadth of decorrelation shapes the TPC-H workload is
designed to probe: correlated min (q2), two-sided dimension lookups
(q7), market-share conditional ratios (q8), LIKE-filtered profit
rollups (q9), scalar-subquery HAVING (q11), CASE-counting over a
lateness join (q12), view + scalar-max (q15), NOT-IN anti-join under a
distinct count (q16), correlated average threshold (q17), disjunctive
multi-band predicates (q19), nested semi-joins (q20), and the
exists/not-exists multi-supplier shape (q21).

Schema adaptations (documented per query): the synthetic star schema
(TESTDATA.md) has no partsupp table, no l_shipmode / l_commitdate /
l_receiptdate, no c_phone and no p_container / p_mfgr. Queries that
reference those express the same JOIN/decorrelation shape through the
observable columns: lineitem is the part<->supplier relation (unit
price = l_extendedprice / l_quantity stands in for ps_supplycost),
lateness is measured against o_orderdate, and category predicates move
to the columns that exist (p_size sets, o_orderpriority classes,
c_nationkey sets).

Scale design (100 TB): every dimension side (part filters, supplier,
nation, region, per-part thresholds, the q18-style keysets) broadcasts;
fact-side predicates push to the parquet scan; fact-fact joins shuffle
on the join key once and derived frames keyed the same way (q21's
per-order stats) ride exchange reuse; every LIMIT orders by a rounded
measure plus a unique key so both engines cut the same set.

Cross-engine float discipline: sums/averages are rounded with
functions/rounding.py arithmetic on BOTH engines before they are
output, ordered on, or compared for equality (q15's max-revenue
equality is on the ROUNDED total, making the tie set
engine-independent). Raw-double comparisons (q11's value > 0.1% of
total, q17's quantity < 0.2*avg) follow the q22 precedent: the
operands are sums of identical doubles whose cross-engine delta is
~1e-13 relative, against integer-valued quantities — boundary flips
require a measure within float noise of the threshold, which the
integer-grained data cannot produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8e_fetch_spark.functions.rounding import round_fixed, sql_round
from k8e_fetch_spark.io import load
from k8e_fetch_spark.queries.registry import register

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


_Q2_ORACLE = f"""
    WITH eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    target_parts AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_size <= 15 AND p_type = 'STANDARD'),
    costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN target_parts ON l_partkey = p_partkey
      JOIN eu_supp ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    best AS (SELECT l_partkey AS bk, min(unit_cost) AS best_cost FROM costs GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_name,
           {sql_round('unit_cost', 4)} AS min_cost
    FROM costs JOIN best ON l_partkey = bk AND unit_cost = best_cost
    JOIN eu_supp ON l_suppkey = s_suppkey
    JOIN target_parts ON l_partkey = p_partkey
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 10
"""


@register("tpch_q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("ext-typed-relational", "tpch", "correlated-min"))
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style minimum-cost supplier, adapted (no partsupp: the
    observable part<->supplier relation is lineitem, and the unit price
    min(l_extendedprice / l_quantity) stands in for ps_supplycost).
    The correlated-min subquery becomes: aggregate unit cost per
    (part, supplier), then keep the rows at the per-part minimum via a
    window over the aggregate — the min is an exact selection over
    identical doubles, so the equality is engine-stable.
    Supplier/nation/region and the filtered part list broadcast; the
    fact shuffles once for the (part, supplier) aggregate and the small
    aggregated frame once more for the per-part window."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    li = load(spark, sf_dir, "lineitem")
    costs = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # Per-part minimum as a WINDOW over the aggregate, not an
    # aggregate-joined-back: the join form re-executes the whole
    # scan->broadcast-joins->aggregate chain on both sides (verified on
    # the executed plan — no exchange reuse, 2x the fact work), while
    # the window adds one keyed exchange of the already-aggregated
    # (part, supplier) frame. Same exact-double min selection, same tie
    # behavior (every supplier at the minimum survives).
    best = costs.withColumn(
        "best_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("best_cost"))
    return (
        best.join(F.broadcast(eu_supp), best.l_suppkey == eu_supp.s_suppkey)
        .join(F.broadcast(parts), costs.l_partkey == parts.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            round_fixed(F.col("unit_cost"), 4).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(10)
    )


_Q7_ORACLE = f"""
    SELECT supp_nation, cust_nation, l_year, {sql_round('sum(volume)', 2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01')
    GROUP BY 1, 2, 3
"""


@register("tpch_q7_volume_shipping", oracle=_Q7_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two trading nations: the same
    nation dimension is joined TWICE against one fact row (supplier
    side and customer side) with a symmetric pair predicate. Both
    nation lookups broadcast; the disjunctive pair filter runs after
    them, before the aggregate shuffle on (nation, nation, year)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(round_fixed(F.sum(_rev()), 2).alias("revenue"))
    )


_Q8_ORACLE = f"""
    SELECT o_year,
           {sql_round("sum(CASE WHEN supp_nation = 'NATION_21' THEN volume ELSE 0 END) / sum(volume)", 4)} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    GROUP BY o_year
"""


@register("tpch_q8_market_share", oracle=_Q8_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_21's share of ECONOMY-part
    revenue sold into the AMERICA region, by order year. The share is a
    conditional-sum / total-sum ratio computed in ONE aggregate pass
    (no self-join); all five dimension hops broadcast."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    customer = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = _rev()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round_fixed(
                F.sum(F.when(F.col("supp_nation") == "NATION_21", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


_Q9_ORACLE = """
    SELECT nation, o_year,
           CAST(CAST(sum(CAST(floor(amount * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%')
    GROUP BY 1, 2
"""


@register("tpch_q9_product_profit", oracle=_Q9_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit, adapted (no partsupp: profit is
    the discounted revenue without the ps_supplycost * l_quantity
    term). The LIKE '%bolt%' part filter broadcasts as a reduced join
    list; supplier routes the revenue to its nation; one aggregate
    shuffle on (nation, year).

    Float discipline: the (nation, year) groups are the largest sums in
    the suite (~1e7 at sf0.1) — large enough that engine-dependent sum
    order can land a post-hoc rounding on different sides of a cent
    boundary. Each amount is therefore fixed to EXACT integer cents per
    row (identical input doubles -> identical bigints) and summed as
    int64: the per-group total is bit-identical on both engines by
    construction, at any scale."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    cents = F.floor(_rev() * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(cents).cast("double") / F.lit(100.0)).cast("double").alias("sum_profit"))
    )


_Q11_ORACLE = f"""
    WITH val AS (
      SELECT l_partkey AS ps_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_21'
      GROUP BY 1)
    SELECT ps_partkey, {sql_round('value', 2)} AS value
    FROM val
    WHERE value > (SELECT sum(value) * 0.001 FROM val)
"""


@register("tpch_q11_important_stock", oracle=_Q11_ORACLE, tags=("ext-typed-relational", "tpch", "scalar-subquery"))
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock, adapted (no partsupp: per-part value
    is the discounted revenue supplied by NATION_21 suppliers, from
    lineitem). The HAVING-against-global-fraction scalar subquery
    becomes an unpartitioned window SUM over the per-part aggregate —
    ONE fact scan (the broadcast-threshold form re-executed the whole
    scan+join+aggregate chain inside the broadcast subplan; verified
    on q2's executed plan, same shape). The window's single partition
    holds only the per-part aggregate (rows = |parts|, orders of
    magnitude below the fact), the standard width-then-collapse shape
    of a global-fraction threshold."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_21")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(_rev()).alias("value"))
    )
    return (
        val.withColumn(
            "_thresh",
            F.sum("value").over(Window.partitionBy()) * F.lit(0.001),
        )
        .filter(F.col("value") > F.col("_thresh"))
        .select("ps_partkey", round_fixed(F.col("value"), 2).alias("value"))
    )


_Q12_ORACLE = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
"""


@register("tpch_q12_late_lines", oracle=_Q12_ORACLE, tags=("ext-typed-relational", "tpch"))
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority count, adapted (no l_shipmode /
    l_commitdate / l_receiptdate: 'late' means shipped more than 60
    days after the order date, grouped by l_linestatus instead of ship
    mode). Exercises the join-side date-arithmetic predicate (cannot
    push to either scan alone) plus CASE-counting aggregation."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # NULL-priority rows must land in NEITHER count: the oracle's
    # NOT IN evaluates to NULL for a NULL priority (counted 0), so a
    # bare .otherwise(1) here would diverge if priorities ever gain
    # NULLs. Guard the low branch on isNotNull to pin both engines to
    # the same semantics.
    low = F.col("o_orderpriority").isNotNull() & ~high
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(low, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q15_ORACLE = f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@register("tpch_q15_top_supplier", oracle=_Q15_ORACLE, tags=("ext-typed-relational", "tpch", "scalar-subquery"))
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the revenue VIEW becomes a derived
    frame, and the scalar max-revenue subquery an unpartitioned window
    MAX over it — ONE fact scan (the broadcast form re-executed the
    quarter scan + aggregate inside the broadcast subplan), with the
    window's single partition holding only the per-supplier aggregate.
    The max-equality is evaluated on the ROUNDED revenue so the tie set
    is engine-independent. The quarter filter pushes to the scan; one
    aggregate shuffle; supplier broadcasts onto the (tiny) winner set."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        round_fixed(F.sum(_rev()), 2).alias("total_revenue")
    )
    supplier = load(spark, sf_dir, "supplier")
    return (
        rev.withColumn("_max_rev", F.max("total_revenue").over(Window.partitionBy()))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q16_ORACLE = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
"""


@register("tpch_q16_supplier_count", oracle=_Q16_ORACLE, tags=("ext-typed-relational", "tpch", "anti-join"))
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 part/supplier relationship, adapted (no partsupp: the
    relation observed in lineitem; the complaint-supplier exclusion
    becomes the negative-balance suppliers). The NOT IN is a broadcast
    LEFT ANTI join (the excluded keyset is tiny and null-free by
    construction); distinct supplier count per (brand, type, size) is
    Spark's two-phase expand aggregate."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, how="left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q17_ORACLE = f"""
    WITH pavg AS (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY 1)
    SELECT {sql_round('sum(l_extendedprice) / 7.0', 2)} AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    JOIN pavg ON l_partkey = pk
    WHERE p_brand = 'Brand#5' AND l_quantity < qty_thresh
"""


@register("tpch_q17_small_quantity", oracle=_Q17_ORACLE, tags=("ext-typed-relational", "tpch", "correlated-avg"))
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated
    avg(l_quantity) subquery decorrelates into a per-part aggregate
    joined back to the fact. The threshold frame is deliberately NOT
    hint-broadcast: it is fact-DERIVED with one row per part, and at
    extreme scale the part dimension outgrows broadcast memory — AQE
    broadcasts it while it fits and falls back to a shuffle join when
    it does not (the brand dim, genuinely small, does broadcast).
    Quantities are integer-valued so the 0.2*avg comparison cannot sit
    inside float noise of a boundary."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pavg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            round_fixed(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_ORACLE = f"""
    SELECT {sql_round('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_discounted_revenue", oracle=_Q19_ORACLE, tags=("ext-typed-relational", "tpch", "disjunctive"))
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue, adapted (no p_container /
    l_shipmode: the three disjunct bands are (brand, size, quantity)
    triples). The OR-of-ANDs predicate spans both join sides, so it
    evaluates post-join — but Catalyst still derives the pushable
    per-side residuals (brand set on part, quantity envelope on
    lineitem). Part broadcasts; one row out."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            round_fixed(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q20_ORACLE = """
    WITH qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    reds AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM qty JOIN reds ON l_partkey = p_partkey WHERE sq > 50)
"""


@register("tpch_q20_potential_promotion", oracle=_Q20_ORACLE, tags=("ext-typed-relational", "tpch", "semi-join"))
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, adapted (no partsupp
    availqty: a supplier qualifies by having shipped more than 50
    units of some red-named part during the year). Two nested
    semi-joins — parts into the per-(part,supplier) quantity
    aggregate, then qualifying suppliers into the supplier dim — both
    expressed as LEFT SEMI so no side ever duplicates. Quantity sums
    are integer-valued: the > 50 cut is exact on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    reds = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    qty = (
        li.join(F.broadcast(reds), li.l_partkey == reds.p_partkey, how="left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 50)
        .select("l_suppkey")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supplier.join(F.broadcast(qty), supplier.s_suppkey == qty.l_suppkey, how="left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


_Q21_ORACLE = """
    WITH lateness AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2),
    per_order AS (
      SELECT l_orderkey AS ok, count(*) AS n_supps, sum(is_late) AS n_late
      FROM lateness GROUP BY 1)
    SELECT s_name, count(*) AS numwait
    FROM lateness JOIN per_order ON l_orderkey = ok
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE is_late = 1 AND n_supps > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@register("tpch_q21_waiting_supplier", oracle=_Q21_ORACLE, tags=("ext-typed-relational", "tpch", "exists-not-exists"))
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting, adapted (no
    l_receiptdate/l_commitdate: 'late' = shipped >30 days after the
    order date). The original's EXISTS (another supplier in the order)
    AND NOT EXISTS (another LATE supplier) pair decorrelates into
    per-order stats — n_supps > 1 expresses the EXISTS, n_late = 1 the
    NOT EXISTS (the only late supplier is this one) — computed as
    WINDOW aggregates over the per-(order, supplier) lateness frame
    rather than a second aggregation joined back: Spark's plan
    deduplicator does not recognize the two aggregate branches as one
    (verified on the executed plan: the join form scans the fact
    twice), while the window form is a single linear pipeline — ONE
    fact scan, the (orderkey, suppkey) aggregate exchange, one
    orderkey re-exchange for the window. Supplier broadcasts; top-20
    on (count, name)."""
    from pyspark.sql.window import Window

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), 1
    ).otherwise(0)
    lateness = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    supplier = load(spark, sf_dir, "supplier")
    return (
        lateness.withColumn("n_supps", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter((F.col("is_late") == 1) & (F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
