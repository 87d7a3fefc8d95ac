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
    customer side carries no hint: AQE broadcasts it at fixture scale
    and switches to a shuffled join once the segment outgrows the
    threshold at warehouse scale; orders⋈lineitem shuffles on
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
        .join(c, o["o_custkey"] == c["c_custkey"])
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
    dimension chain joined onto orders, fact-fact to lineitem, then
    the 'local supplier' same-nation constraint closes the loop. The
    only big shuffles are orders⋈lineitem on the order key and the final
    nation rollup. Nation/region carry explicit broadcast hints (they
    are bounded dims); the customer-derived chain does NOT — AQE
    broadcasts it at fixture scale and shuffles it once customers
    outgrow the threshold. The join-reorder / broadcast-selection
    showcase."""
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
        .join(dims, o["o_custkey"] == dims["c_custkey"])
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
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r2(F.sum("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


# --- Q6 shape: forecast revenue change ----------------------------------------
@query(
    "q6_revenue_delta",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("tpch-q6", "P2", "A3"),
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure predicate-pushdown scan-aggregate — every
    filter (date range, discount band, quantity cap) reaches the parquet
    scan as PushedFilters, surviving rows fold into ONE partial→final
    sum with no shuffle of data rows at all. At 100 TB this is the query
    whose cost is I/O alone; any plan that moves rows before the partial
    agg is wrong. The what-if revenue kernel of the reference's sweep
    research (backtesting_and_research/run_sweep.py slippage deltas)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue")
    )


# --- Q7 shape: volume shipping between two nations ----------------------------
Q7_A, Q7_B = "NATION_3", "NATION_14"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = '{Q7_A}' AND nc.n_name = '{Q7_B}')
        OR (ns.n_name = '{Q7_B}' AND nc.n_name = '{Q7_A}'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch-q7", "J3", "A1"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade-flow rollup — revenue between an
    ordered pair of nations, by direction and ship year. The nation dim
    joins twice under two aliases (supplier side, customer side); the
    OR-of-two-directions predicate cannot push below either single join,
    so it applies right after both nation names are in scope — BEFORE
    the group-by shuffle. Fact-fact joins shuffle on the order key;
    every dimension side broadcasts. Year extraction is cast to BIGINT
    on both engines (Spark year() is int32, DuckDB EXTRACT is int64)."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    both = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), s["s_suppkey"] == li["l_suppkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            ((F.col("supp_nation") == Q7_A) & (F.col("cust_nation") == Q7_B))
            | ((F.col("supp_nation") == Q7_B) & (F.col("cust_nation") == Q7_A))
        )
    )
    return both.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        r2(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("revenue")
    )


# --- Q8 shape: national market share ------------------------------------------
Q8_REGION, Q8_NATION = "ASIA", "NATION_5"


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN ns.n_name = '{Q8_NATION}'
                          THEN l.l_extendedprice * (1.0 - l.l_discount)
                          ELSE 0.0 END)
                 / SUM(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = '{Q8_REGION}'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_year
    """,
    tags=("tpch-q8", "J3", "A3"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share = conditional-sum ÷ total-sum per
    year, over region-scoped demand. The share numerator is a CASE sum
    inside the SAME aggregation as the denominator — one shuffle
    produces both, never two scans. The customer→nation→region chain
    restricts demand (broadcast, prunes before the fact shuffle); the
    supplier→nation chain only labels the numerator. Ratio-of-sums is
    evaluated after both sums complete, then stable-rounded on both
    engines."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    s = t(spark, sf_dir, "supplier")
    demand_nations = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    cust = c.join(
        F.broadcast(demand_nations), c["c_nationkey"] == F.col("c_nkey"), "left_semi"
    ).select("c_custkey")
    supp = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nkey"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nkey"),
    ).select("s_suppkey", "supp_nation")
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"], "left_semi")
        .join(F.broadcast(supp), supp["s_suppkey"] == li["l_suppkey"])
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            r4(
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(F.lit(0.0)))
                / F.sum(vol)
            ).alias("mkt_share")
        )
    )


# --- Q13 shape: customer order-count distribution -----------------------------
@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch-q13", "J3", "A10"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over an OUTER join —
    per-customer order count (zero-order customers kept by the left
    join; COUNT of the right key counts non-null matches only), then
    the distribution of those counts. The priority predicate belongs to
    the JOIN CONDITION, not a post-filter — filtering the right side
    before the join is the pushed-down equivalent. First agg shuffles
    on c_custkey (same key as the join → AQE coalesces into one
    exchange); second agg is over the tiny histogram."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q15 shape: top supplier (argmax against a scalar subquery) ---------------
@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("tpch-q15", "J8", "A5"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: equality against a scalar aggregate — suppliers
    whose quarterly revenue equals the global maximum (ALL of them, so
    ties surface rather than being cut by a LIMIT). The revenue CTE is
    computed ONCE and reused for both the max and the final join (Spark:
    one DataFrame object → AQE reuses the exchange; a naive engine scans
    lineitem twice). Revenue is stable-rounded BEFORE the max/equality
    so both engines compare identical doubles. The 1-row max side joins
    as a broadcast equi-join on the rounded value."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        r2(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("total_revenue"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), "total_revenue", "left_semi")
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q16 shape: supplier variety per part attribute ---------------------------
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


@query(
    "q16_supplier_variety",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#21'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN {Q16_SIZES}
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch-q16", "A19", "J-anti"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute with
    a NOT-IN supplier blocklist. The blocklist is a left_anti broadcast
    (keys are non-null, so NOT IN ≡ anti join — the NULL-poisoned NOT IN
    trap documented on anti_join_dormant_customers applies otherwise).
    Part predicates prune before the fact join; distinct-count runs as
    Spark's two-phase partial-distinct expand, one shuffle on the group
    key. At 100 TB the blocklist stays a broadcast; the distinct shuffle
    is the only wide stage."""
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#21")
        & (~F.col("p_type").startswith("MEDIUM"))
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").join(F.broadcast(bad), "l_suppkey", "left_anti")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q22 shape: dormant high-balance accounts ---------------------------------
@query(
    "q22_dormant_balance",
    oracle="""
    WITH thresh AS (
        SELECT FLOOR(AVG(c_acctbal) * 1e2 + 0.5) / 1e2 AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY nation
    """,
    tags=("tpch-q22", "J8", "J-anti", "A1"),
)
def q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance global average (scalar
    subquery, stable-rounded to 2dp on BOTH engines before the
    comparison — partial-sum order differs between engines, so the raw
    double average is not bit-identical) gates customers, an anti join
    removes anyone with a recent order, and the survivors roll up per
    nation. Extends anti_join_dormant_customers (J-anti) with the
    decorrelated-scalar-threshold shape. The 1-row threshold joins as a
    broadcast nested loop (non-equi scalar compare) — constant cost;
    the anti join's right side is pre-filtered to recent orderers."""
    c = t(spark, sf_dir, "customer")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        r2(F.avg("c_acctbal")).alias("avg_bal")
    )
    recent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(recent), "c_custkey", "left_anti")
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("numcust"), r2(F.sum("c_acctbal")).alias("totacctbal"))
    )


# --- Q17 shape: small-quantity revenue (correlated scalar aggregate) ----------
Q17_BRAND = "Brand#11"


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey, 0.5E0 * AVG(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0E0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa    ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
      AND l.l_quantity < pa.half_avg
    """,
    tags=("tpch-q17", "J8", "A12"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a CORRELATED scalar aggregate — each lineitem
    compares against the average quantity OF ITS OWN PART — decorrelated
    the way every modern optimizer rewrites it: pre-aggregate per-part
    averages once, join back on the part key, filter. The brand filter
    prunes the part side (AQE broadcasts it while it fits; part is
    fact-proportional at warehouse scale, so no hard hint); the
    per-part average is the one shuffle. The comparison is exact cross-engine because l_quantity is
    integral: the partial sums are integer-valued doubles (< 2^53), so
    AVG is bit-identical regardless of accumulation order. At 100 TB the
    decorrelated form is mandatory — a row-per-row subquery re-scan is
    quadratic."""
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == Q17_BRAND)
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(pa, "l_partkey")
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(r2(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )
