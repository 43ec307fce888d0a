"""Relational operator coverage over the driver fixtures (SURVEY.md §2).

Each query exercises one operator shape the engine relies on — scan+filter
pushdown, broadcast/sort-merge joins, anti/semi joins, hash aggregation,
window functions, set ops — with a DuckDB oracle. All float aggregates are
cast to DECIMAL before summing so results are order-independent, then the
FINAL value is cast to DOUBLE on both sides: the driver hashes pandas
values, and Spark decimals surface as Decimal objects while DuckDB widened
decimals surface as float64 — only a common terminal type hashes equal.
(The decimal→double conversion of the same exact sum is correctly rounded
in both engines, so the doubles are bit-identical.) Integer sums are BIGINT
on the Spark side and CAST(... AS BIGINT) in the oracle (DuckDB sum() over
integers returns HUGEINT → float64 in pandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.tpch import load_table

DEC = "decimal(18,2)"


# ---- hash aggregation (partial+final, Catalyst) ---------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash agg with derived expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---- broadcast dim joins (star schema rollup) ------------------------------

def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region, small dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("sum_acctbal"),
        )
    )


# ---- large join (sort-merge / shuffled hash via AQE) -----------------------

def q_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem on orderkey, filtered both sides (TPC-H Q3 shape)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.filter(F.col("o_orderdate") < F.lit("1995-03-15"))
        .join(li.filter(F.col("l_shipdate") > F.lit("1995-03-15")), o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).alias("revenue")
        )
        .filter(F.col("revenue") > 100000)
        .withColumn("revenue", F.col("revenue").cast("double"))
    )


# ---- anti / semi joins ------------------------------------------------------

def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    finished = o.filter(F.col("o_orderstatus") == "F")
    return (
        c.join(finished, c.c_custkey == finished.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_idle_customers"))
    )


def q_suppliers_in_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left-semi: suppliers in nations that have high-balance customers."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_nationkey").distinct()
    return (
        s.join(rich, s.s_nationkey == rich.c_nationkey, "left_semi")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"))
    )


# ---- window functions -------------------------------------------------------

def q_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number window, deterministic tiebreak on orderkey."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_totalprice").cast(DEC).cast("double").alias("top_totalprice"),
        )
    )


def q_running_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate window (sum over partition) + rank."""
    o = load_table(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )
    w = Window.partitionBy("o_orderstatus")
    return per_status.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_orders",
        F.sum("n_orders").over(w).cast("long").alias("status_total"),
    )


# ---- time-bucketed event aggregation (streaming analogue in batch) ---------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---- set operations ---------------------------------------------------------

def q_click_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): hours in which clicks occurred but no
    purchase did."""
    ev = load_table(spark, sf_dir, "events")
    hours = lambda t: (
        ev.filter(F.col("event_type") == t)
        .select(F.date_trunc("hour", F.col("ts")).alias("click_hour"))
        .distinct()
    )
    return hours("click").subtract(hours("purchase"))


# ---- distinct / dedup (exact) ----------------------------------------------

def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: survivors = min(doc_id) per text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


# ---- multi-join volume shipping (TPC-H Q7 shape) ----------------------------

def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier-nation x customer-nation shipping volume: a 5-way join
    (lineitem-orders-customer + supplier, both sides to nation) with a
    year-sliced aggregate. The two nation dims broadcast (tiny); the
    l-o and o-c joins shuffle on their keys; AQE handles skew."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q14 shape): promo vs total revenue per
    month — numerator/denominator kept as separate decimal sums (exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    return joined.groupBy(
        F.year("l_shipdate").alias("l_year"), F.month("l_shipdate").alias("l_month")
    ).agg(
        F.sum(F.when(F.col("p_type").startswith("PROMO"), vol).otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double").alias("promo_revenue"),
        F.sum(vol).cast("double").alias("total_revenue"),
    )


def q_big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-filter (TPC-H Q18 shape): orders whose total quantity exceeds a
    threshold — aggregate then HAVING, joined back to the customer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


def q_supplier_exists_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS rewritten as a left-semi join: suppliers that
    shipped at least one item of a large part (p_size >= 40)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    large_items = li.join(
        F.broadcast(p.filter(F.col("p_size") >= 40).select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    ).select("l_suppkey").distinct()
    return s.join(large_items, s.s_suppkey == F.col("l_suppkey"), "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


def q_mktsegment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets aggregate: order totals by (segment, status)
    with segment-level and grand totals (null-marked subtotal rows)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


QUERIES = {
    "rel_nation_trade_volume": q_nation_trade_volume,
    "rel_promo_share": q_promo_share,
    "rel_big_orders_having": q_big_orders_having,
    "rel_supplier_exists_part": q_supplier_exists_part,
    "rel_mktsegment_rollup": q_mktsegment_rollup,
    "rel_pricing_summary": q_pricing_summary,
    "rel_region_rollup": q_region_rollup,
    "rel_order_revenue": q_order_revenue,
    "rel_customers_without_orders": q_customers_without_orders,
    "rel_suppliers_semi": q_suppliers_in_active_nations,
    "rel_top_order_per_customer": q_top_order_per_customer,
    "rel_running_share": q_running_share,
    "rel_events_hourly": q_events_hourly,
    "rel_click_no_purchase": q_click_no_purchase,
    "rel_dedup_exact_docs": q_dedup_exact_docs,
}

ORACLES = {
    "rel_nation_trade_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "rel_promo_share": """
        SELECT CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(month(l_shipdate) AS INT) AS l_month,
               CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    """,
    "rel_big_orders_having": """
        WITH big AS (
          SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
          FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
        )
        SELECT c_name, o_orderkey, o_orderdate, CAST(total_qty AS DOUBLE) AS total_qty
        FROM big JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "rel_supplier_exists_part": """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size >= 40 AND l_suppkey = s.s_suppkey
        )
    """,
    "rel_mktsegment_rollup": """
        SELECT c_mktsegment, o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
    """,
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_region_rollup": """
        SELECT r_name, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "rel_order_revenue": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) > 100000
    """,
    "rel_customers_without_orders": """
        SELECT c_mktsegment, count(*) AS n_idle_customers
        FROM customer ANTI JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
          ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    "rel_suppliers_semi": """
        SELECT s_nationkey, count(*) AS n_suppliers
        FROM supplier SEMI JOIN (
            SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9000
        ) rich ON s_nationkey = c_nationkey
        GROUP BY s_nationkey
    """,
    "rel_top_order_per_customer": """
        SELECT o_custkey, o_orderkey AS top_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS top_totalprice
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
            ) AS rn FROM orders
        ) WHERE rn = 1
    """,
    "rel_running_share": """
        SELECT o_orderstatus, o_orderpriority, n_orders,
               CAST(sum(n_orders) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS status_total
        FROM (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        )
    """,
    "rel_events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2
    """,
    "rel_click_no_purchase": """
        SELECT DISTINCT date_trunc('hour', ts) AS click_hour
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT date_trunc('hour', ts)
        FROM events WHERE event_type = 'purchase' 
    """,
    "rel_dedup_exact_docs": """
        SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
}
