"""Relational operator coverage over the driver fixtures (SURVEY.md §2).

Each query exercises one operator shape the engine relies on — scan+filter
pushdown, broadcast/sort-merge joins, anti/semi joins, hash aggregation,
window functions, set ops — with a DuckDB oracle. All float aggregates are
cast to DECIMAL before summing so results are order-independent and
bit-comparable across engines.
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
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).alias("sum_disc_price"),
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
            F.sum(F.col("c_acctbal").cast(DEC)).alias("sum_acctbal"),
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
            F.col("o_totalprice").cast(DEC).alias("top_totalprice"),
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
        F.sum("n_orders").over(w).alias("status_total"),
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
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
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


QUERIES = {
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
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
               sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_region_rollup": """
        SELECT r_name, count(*) AS n_customers,
               sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "rel_order_revenue": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < TIMESTAMP '1995-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        HAVING revenue > 100000
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
               CAST(o_totalprice AS DECIMAL(18,2)) AS top_totalprice
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
            ) AS rn FROM orders
        ) WHERE rn = 1
    """,
    "rel_running_share": """
        SELECT o_orderstatus, o_orderpriority, n_orders,
               sum(n_orders) OVER (PARTITION BY o_orderstatus) AS status_total
        FROM (
            SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        )
    """,
    "rel_events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               sum(CAST(value AS DECIMAL(18,4))) AS sum_value,
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
