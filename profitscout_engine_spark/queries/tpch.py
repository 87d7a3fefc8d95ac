"""Classic decision-support queries (TPC-H shapes Q1/Q3/Q5/Q18) over the
fixture star schema — the standard OLAP parity pack. The reference's
research SQL is BigQuery ad-hoc of exactly these shapes (group-filter-
join-topk rollups, e.g. backtesting_and_research/run_sweep.py's cohort
aggregations); here they run as DataFrame plans whose oracle is the
same ANSI SQL.

Determinism: every float aggregate is stable-rounded at the comparison
point; every top-k orders by the ROUNDED measure with a unique key
tie-break so both engines cut the same rows.

Scale notes (100 TB): these are the canonical Catalyst showcases —
filters push to the parquet scan, dimension joins broadcast
(region/nation/customer-segment sides are small), fact-fact joins
shuffle on the join key with AQE sizing, aggregations run
partial→final. The plan-hygiene suite gates all of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import r2, r4
from . import query
from ._util import t


# --- Q1 shape: pricing summary ------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2)
               AS sum_charge,
           ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
           ROUND(SUM(l_extendedprice) / COUNT(*), 4) AS avg_price,
           ROUND(SUM(l_discount) / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch-q1", "A1", "P1"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-fact-scan pricing summary with derived-measure
    sums. The date filter pushes to the scan; one partial→final hash
    aggregation over a 6-group key; averages are SUM/COUNT so both
    engines evaluate the identical division. The canonical 'does the
    engine do scan-heavy rollups right' query."""
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        r2(F.sum(disc_price)).alias("sum_disc_price"),
        r2(F.sum(disc_price * (F.lit(1.0) + F.col("l_tax")))).alias("sum_charge"),
        r4(F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
        r4(F.sum("l_extendedprice") / F.count("*")).alias("avg_price"),
        r4(F.sum("l_discount") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --- Q3 shape: shipping-priority top-k ----------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    WITH rev AS (
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM rev
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch-q3", "J1", "T1"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dim broadcast onto
    orders, fact-fact join to lineitem on the order key, revenue rollup,
    distributed top-10. Ordering uses the ROUNDED revenue with the order
    key as tie-break so both engines cut identical rows. The filtered
    customer side is small → broadcast; orders⋈lineitem shuffles on
    o_orderkey (co-partitionable/bucketable at scale)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10).select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    )


# --- Q5 shape: local-supplier revenue by nation -------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'AMERICA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("tpch-q5", "J3", "A1"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table snowflake join — region→nation→customer
    dimension chain broadcast onto orders, fact-fact to lineitem, then
    the 'local supplier' same-nation constraint closes the loop. The
    only big shuffles are orders⋈lineitem on the order key and the final
    nation rollup; every dimension side broadcasts. The join-reorder /
    broadcast-selection showcase."""
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    dims = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(dims), o["o_custkey"] == dims["c_custkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == li["l_suppkey"])
            & (s["s_nationkey"] == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("revenue")
        )
    )


# --- Q18 shape: large-volume customers ----------------------------------------
Q18_QTY = 150.0


@query(
    "q18_large_volume_customer",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > {Q18_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("tpch-q18", "A7", "J1", "T1"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered semi-join — orders whose total
    quantity exceeds the threshold, re-joined to customers and rolled
    up, top-100 by price. The 'big orders' set is computed once (one
    aggregation over the fact) and semi-joins back; at scale that set
    is small → broadcast semi-join, and the final sort is a bounded
    top-k, never a full order-by."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > Q18_QTY)
        .select("l_orderkey")
    )
    o = t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big["l_orderkey"], "left_semi"
    )
    c = t(spark, sf_dir, "customer")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r2(F.sum("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )
