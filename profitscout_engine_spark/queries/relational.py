"""Relational core: scans, projections, filters, predicates, joins
(SURVEY §2.1-§2.3, §2.8).

Every query is the Spark-first expression of a reference behavior, with its
oracle SQL inline. Filters and projections are written so Catalyst pushes
them into the parquet scan (verified via .explain in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import contract_symbol, pct_change, r2, r4, r6
from . import query
from ._util import t


# --- S1/P1/P2: projected, predicate-pushed scan -------------------------------
@query(
    "pruned_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROUND(l_extendedprice, 2) AS extprice
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1997-06-01'
    """,
    tags=("S1", "P1", "P2"),
)
def pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold + range predicates with an explicit projection; both reach
    the parquet scan (PushedFilters + pruned ReadSchema)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").between(10, 20)
            & (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            r2(F.col("l_extendedprice")).alias("extprice"),
        )
    )


# --- P3: compound AND/OR gate (the V3 eligibility-gate shape) -----------------
@query(
    "compound_gate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice >= 150000
      AND (o_orderstatus = 'O' OR o_orderpriority LIKE '1%')
    """,
    tags=("P3",),
)
def compound_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """premium_score>=2 AND (vol>250 OR oi>500) shape
    (forward-paper-trader eligibility gate)."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_totalprice") >= 150000)
            & ((F.col("o_orderstatus") == "O") | F.col("o_orderpriority").startswith("1"))
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            r2(F.col("o_totalprice")).alias("totalprice"),
        )
    )


# --- P4: negated conjunction (VIX pivot-logic filter) -------------------------
@query(
    "negated_conjunction",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    WHERE NOT (value >= 18 AND event_type = 'click')
    """,
    tags=("P4",),
)
def negated_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT (VIX>=18 AND direction='BULLISH') shape (monte_carlo_sniper pivot)."""
    return (
        t(spark, sf_dir, "events")
        .filter(~((F.col("value") >= 18) & (F.col("event_type") == "click")))
        .select("event_id", "user_id", "event_type", r2(F.col("value")).alias("value"))
    )


# --- P5+P8: null predicates + null-on-error coercion --------------------------
@query(
    "null_guard_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS prop_k
    FROM events
    WHERE TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) IS NOT NULL
      AND TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) >= 50
    """,
    tags=("P5", "P8", "P10"),
)
def null_guard_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→number extraction with null-on-error cast, then an IS NOT NULL
    state filter (the win-tracker `performance_updated IS NULL` shape)."""
    k = F.regexp_extract(F.col("props"), r'"k": ([0-9]+)', 1).cast("long")
    return (
        t(spark, sf_dir, "events")
        .select("event_id", k.alias("prop_k"))
        .filter(F.col("prop_k").isNotNull() & (F.col("prop_k") >= 50))
    )


# --- P6: membership semi-filter (universe gate) -------------------------------
@query(
    "membership_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 200000)
    """,
    tags=("P6",),
)
def membership_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ticker in universe` as isin + a left-semi join against a fact table.
    The semi join shuffles only keys; at scale the isin set broadcasts."""
    big_orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# --- P7: coalesce fallback chain (price = day.close → lastTrade → prevDay) ----
@query(
    "coalesce_fallback",
    oracle="""
    SELECT event_id,
           ROUND(COALESCE(
               CASE WHEN value >= 10 THEN value END,
               CASE WHEN value >= 5 THEN value * 2 END,
               -1.0), 2) AS resolved_price
    FROM events
    """,
    tags=("P7",),
)
def coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fallback chain over null-injected candidates (polygon price chains)."""
    primary = F.when(F.col("value") >= 10, F.col("value"))
    secondary = F.when(F.col("value") >= 5, F.col("value") * 2)
    return t(spark, sf_dir, "events").select(
        "event_id",
        r2(F.coalesce(primary, secondary, F.lit(-1.0))).alias("resolved_price"),
    )


# --- P9: string-to-number extraction ("VIX 18.42" → 18.42) --------------------
@query(
    "string_extract",
    oracle="""
    SELECT c_custkey,
           CAST(split_part(c_name, '#', 2) AS BIGINT) AS cust_num,
           upper(trim(c_mktsegment)) AS segment
    FROM customer
    """,
    tags=("P9",),
)
def string_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split()[-1] → cast (deep_pattern_analysis VIX-string cleanup shape)."""
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.element_at(F.split(F.col("c_name"), "#"), -1).cast("long").alias("cust_num"),
        F.upper(F.trim(F.col("c_mktsegment"))).alias("segment"),
    )


# --- P11+P12+A8: derived boolean flags + flag-partition row-count sanity ------
@query(
    "flag_groups",
    oracle="""
    SELECT (l_quantity > 40) AS is_big,
           (l_discount > 0.05) AS is_discounted,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("P11", "P12", "A8"),
)
def flag_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort flags (HEDGE_HIGH_RR-style) + per-flag-group aggregates."""
    return (
        t(spark, sf_dir, "lineitem")
        .withColumn("is_big", F.col("l_quantity") > 40)
        .withColumn("is_discounted", F.col("l_discount") > 0.05)
        .groupBy("is_big", "is_discounted")
        .agg(
            F.count("*").alias("n"),
            r2(F.sum("l_extendedprice")).alias("total_price"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
        )
    )


# --- J1: broadcast dim join chain ---------------------------------------------
@query(
    "dim_enrichment_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
    """,
    tags=("J1", "A1"),
)
def dim_enrichment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dims (ticker→sector/industry shape): the fact table
    never shuffles for the joins — only the final small agg shuffles."""
    li = t(spark, sf_dir, "lineitem")
    sup = F.broadcast(t(spark, sf_dir, "supplier"))
    nat = F.broadcast(t(spark, sf_dir, "nation"))
    reg = F.broadcast(t(spark, sf_dir, "region"))
    return (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(nat, sup["s_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        )
    )


# --- J3: multi-way keyed merge ------------------------------------------------
@query(
    "multiway_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name AS nation,
           ROUND(o.o_totalprice, 2) AS totalprice
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderstatus = 'F' AND o.o_totalprice > 250000
    """,
    tags=("J3",),
)
def multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signals ⋈ technicals ⋈ news shape: two left-to-right equi joins."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 250000)
    )
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .select(
            "o_orderkey",
            "c_name",
            F.col("n_name").alias("nation"),
            r2(F.col("o_totalprice")).alias("totalprice"),
        )
    )


# --- J8: scalar-subquery latest-day filter ------------------------------------
@query(
    "latest_day_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
    FROM orders
    WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
    """,
    tags=("J8",),
)
def latest_day_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE scan_date = (SELECT MAX(scan_date)) — Spark SQL scalar subquery,
    which Catalyst executes as a one-row broadcast."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
        FROM orders
        WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
        """
    )


# --- J7+W8: temporal range join, first-3 future rows per anchor ---------------
@query(
    "future_rows_top3",
    oracle="""
    WITH s AS (
        SELECT event_id AS signal_id, user_id, ts
        FROM events WHERE event_type = 'signup'
    ),
    f AS (
        SELECT s.signal_id, e.value,
               ROW_NUMBER() OVER (PARTITION BY s.signal_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM s JOIN events e
          ON e.user_id = s.user_id AND e.ts > s.ts
    )
    SELECT signal_id,
           ROUND(MAX(CASE WHEN rn = 1 THEN value END), 2) AS day1_value,
           ROUND(MAX(CASE WHEN rn = 2 THEN value END), 2) AS day2_value,
           ROUND(MAX(CASE WHEN rn = 3 THEN value END), 2) AS day3_value,
           ROUND(MAX(CASE WHEN rn <= 3 THEN value END), 2) AS peak_value
    FROM f GROUP BY signal_id
    """,
    tags=("J7", "W8", "W9"),
)
def future_rows_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win-tracker forward-return shape: for each signal, the next 3 rows of
    the entity's series (range join + row_number cut + conditional agg)."""
    from pyspark.sql.window import Window

    signals = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signal_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
    )
    series = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
        "value",
    )
    joined = signals.join(
        series, (series["e_user"] == signals["s_user"]) & (series["e_ts"] > signals["s_ts"])
    )
    w = Window.partitionBy("signal_id").orderBy("e_ts", "e_id")
    ranked = joined.select("signal_id", "value", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 3
    )
    return ranked.groupBy("signal_id").agg(
        r2(F.max(F.when(F.col("rn") == 1, F.col("value")))).alias("day1_value"),
        r2(F.max(F.when(F.col("rn") == 2, F.col("value")))).alias("day2_value"),
        r2(F.max(F.when(F.col("rn") == 3, F.col("value")))).alias("day3_value"),
        r2(F.max(F.when(F.col("rn") <= 3, F.col("value")))).alias("peak_value"),
    )


# --- §2.8 string/date scalar families -----------------------------------------
@query(
    "contract_symbols",
    oracle="""
    SELECT p_partkey,
           'O:' || upper(replace(p_brand, '#', '')) ||
           strftime(DATE '2024-01-01' + p_size, '%y%m%d') ||
           CASE WHEN p_retailprice > 1400 THEN 'C' ELSE 'P' END ||
           lpad(CAST(CAST(ROUND(p_retailprice * 1000, 0) AS BIGINT) AS VARCHAR), 8, '0')
           AS contract_symbol
    FROM part
    """,
    tags=("scalar-string",),
)
def contract_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCC option-symbol formatting (zero-pad, fixed-width, yyMMdd)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        contract_symbol(
            underlying=F.regexp_replace(F.col("p_brand"), "#", ""),
            expiration=F.date_add(F.lit("2024-01-01").cast("date"), F.col("p_size")),
            option_type=F.when(F.col("p_retailprice") > 1400, F.lit("C")).otherwise(F.lit("P")),
            strike=F.col("p_retailprice"),
        ).alias("contract_symbol"),
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS days_to_ref,
           CAST(o_orderdate AS DATE) - 5 AS minus_5d,
           strftime(o_orderdate, '%y%m%d') AS yymmdd
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    tags=("scalar-date",),
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family: parts, diffs, offsets, compact formatting (DTE math,
    staleness checks, yyMMdd symbols)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("date").alias("order_date"),
        F.year(d).cast("int").alias("order_year"),
        F.month(d).cast("int").alias("order_month"),
        F.quarter(d).cast("int").alias("order_quarter"),
        F.dayofweek(d).cast("int").alias("order_dow"),
        F.datediff(F.lit("2001-12-31").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_ref"),
        F.date_sub(d.cast("date"), 5).alias("minus_5d"),
        F.date_format(d, "yyMMdd").alias("yymmdd"),
    )


# --- pct-change + guarded division (§2.8 math) --------------------------------
@query(
    "pct_change_guarded",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND((l_extendedprice - l_extendedprice / NULLIF(l_quantity, 0))
                 / NULLIF(l_extendedprice / NULLIF(l_quantity, 0), 0) * 100, 4)
               AS pct_vs_unit,
           ROUND(l_extendedprice / GREATEST(l_quantity, 1.0), 4) AS guarded_unit_price
    FROM lineitem
    WHERE l_orderkey % 7 = 0
    """,
    tags=("scalar-math",),
)
def pct_change_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pct-change and x/max(y,1) guarded-division idioms."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    unit = F.col("l_extendedprice") / F.nullif(F.col("l_quantity"), F.lit(0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(pct_change(F.col("l_extendedprice"), unit)).alias("pct_vs_unit"),
        r4(F.col("l_extendedprice") / F.greatest(F.col("l_quantity"), F.lit(1.0))).alias(
            "guarded_unit_price"
        ),
    )


# --- P10: JSON extraction from wrapped text -----------------------------------
@query(
    "json_extraction",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(
               regexp_extract('```json' || chr(10) || props || chr(10) || '```',
                              '\\{.*\\}', 0),
               '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_direct
    FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("P10",),
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-output JSON extraction (P10): wrap the payload in ``` fences the
    way model output arrives, strip via bracket-bounded regexp_extract, then
    from_json with an explicit schema; plus direct get_json_object. The
    fence round-trip proves the cleanup path; both stay JVM-side
    (enrichment-trigger/main.py:171-192; agent-arena/agents.py:182-210)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    fenced = F.concat(F.lit("```json\n"), F.col("props"), F.lit("\n```"))
    cleaned = F.regexp_extract(fenced, r"\{.*\}", 0)
    return ev.select(
        "event_id",
        F.from_json(cleaned, "k bigint").getField("k").alias("k"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_direct"),
    )


# --- T4: top-N per partition ---------------------------------------------------
@query(
    "top_n_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS total
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 5
    """,
    tags=("T4",),
)
def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 rows per partition (report generator's top-5-per-direction,
    overnight-report-generator/main.py:147-149) — rank ties broken by key
    so both engines pick identical rows."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", r2(F.col("o_totalprice")).alias("total"))
    )


# --- T3: two-key sort + limit --------------------------------------------------
@query(
    "two_key_sort_limit",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus,
           ROUND(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
    tags=("T3",),
)
def two_key_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY two keys LIMIT n (arena's quality-then-score top-15,
    agent-arena/main.py:65-67) — TakeOrderedAndProject, no full sort."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_orderstatus",
            r2(F.col("o_totalprice")).alias("total"),
        )
    )


# --- §2.7: INTERSECT / EXCEPT --------------------------------------------------
@query(
    "set_ops_intersect_except",
    oracle="""
    WITH big_buyers AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice >= 150000
    ),
    urgent_buyers AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT o_custkey, 'both' AS cohort FROM (
        SELECT o_custkey FROM big_buyers INTERSECT SELECT o_custkey FROM urgent_buyers
    )
    UNION ALL
    SELECT o_custkey, 'big_only' AS cohort FROM (
        SELECT o_custkey FROM big_buyers EXCEPT SELECT o_custkey FROM urgent_buyers
    )
    """,
    tags=("U-intersect", "U-except"),
)
def set_ops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT cohort algebra (SURVEY §2.7 notes the reference
    never needed them; the engine gets them natively as hash anti/semi
    plans, no manual set() round-trips)."""
    o = t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") >= 150000).select("o_custkey").distinct()
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    both = big.intersect(urgent).select("o_custkey", F.lit("both").alias("cohort"))
    big_only = big.exceptAll(urgent).select("o_custkey", F.lit("big_only").alias("cohort"))
    return both.unionByName(big_only)


# --- §2.4: ROLLUP (grouping-sets family) ---------------------------------------
@query(
    "rollup_totals",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("A-rollup",),
)
def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotal hierarchy (status → status×priority → grand total)
    — the multi-granularity daily summary the reference computes with
    separate queries, in one pass of grouping sets."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), r2(F.sum("o_totalprice")).alias("total"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


# --- J-anti: NOT EXISTS as a shuffle-free broadcast anti join -----------------
DORMANT_SINCE = "TIMESTAMP '2000-01-01 00:00:00'"


@query(
    "anti_join_dormant_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= {DORMANT_SINCE}
    )
    """,
    tags=("J-anti", "relational"),
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO order since the cutoff — NOT EXISTS expressed as
    a left_anti join, the churn/dormancy scan every retention pipeline
    runs. The filter on orders pushes to the scan BEFORE the join, so
    the anti side shrinks to recent orderers; with a small-enough right
    side Spark broadcasts it and the customer table never shuffles
    (and at 100 TB the same plan runs as a shuffled anti join on the
    key, still one pass). Keys are non-null here; a NOT IN formulation
    would be NULL-poisoned, which is why the engine surface standardizes
    on anti join / NOT EXISTS.
    """
    c = t(spark, sf_dir, "customer")
    recent = (
        t(spark, sf_dir, "orders")
        .where(F.expr(f"o_orderdate >= {DORMANT_SINCE}"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(F.broadcast(recent), "c_custkey", "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --- T-skyline: Pareto frontier without a dominance self-join -----------------
@query(
    "pareto_frontier",
    oracle="""
    SELECT x.p_partkey, x.p_retailprice, x.p_size
    FROM part x
    WHERE NOT EXISTS (
        SELECT 1 FROM part y
        WHERE y.p_retailprice <= x.p_retailprice AND y.p_size >= x.p_size
          AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
    )
    """,
    tags=("T-skyline", "relational"),
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional skyline (minimize price, maximize size): the parts
    no other part beats on both axes. The oracle spells the textbook
    NOT-EXISTS dominance anti-join (quadratic — fine at oracle scale);
    the engine computes the identical set with NO self-join: collapse to
    per-price max size (parts below their own price-group max are
    dominated in-group), running max over the price-ordered group table
    gives the best size among STRICTLY cheaper prices, and a row
    survives iff it tops its price group and beats that prefix max.
    Cost: one small aggregation + one window over the distinct-price
    table + a join back — linear in rows, log-ish in distinct prices.
    At 100 TB the distinct-price table is the only unpartitioned
    window input; if even that is huge, a coarse price-bucket prefix
    pass prunes first (same trick as the vocab-coverage cumsum)."""
    from pyspark.sql.window import Window

    p = t(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    grp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    grp = grp.withColumn("m1", F.max("gmax").over(w))
    return (
        p.join(grp, "p_retailprice")
        .where(
            (F.col("p_size") == F.col("gmax"))
            & (F.col("m1").isNull() | (F.col("m1") < F.col("p_size")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# --- bipartite projection: co-purchase pair mining ----------------------------
COPURCHASE_MIN_SUPPORT = 3
COPURCHASE_TOPK = 50


@query(
    "copurchase_pairs",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM basket a JOIN basket b
          ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {COPURCHASE_MIN_SUPPORT}
    )
    SELECT p1, p2, n_customers
    FROM pairs
    ORDER BY n_customers DESC, p1, p2
    LIMIT {COPURCHASE_TOPK}
    """,
    tags=("market-basket", "J2", "A1"),
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase mining — the bipartite projection: the
    customer–part purchase graph projects onto part–part edges weighted
    by shared customers, support-filtered and top-k'd (ROUNDED-free
    integer weights; unique-pair tie-break). The pair join is keyed on
    the CUSTOMER — pair volume is sum of per-customer basket-size², the
    same bounded-block arithmetic as fuzzy_dedup_edit's length buckets,
    and the distinct basket pass caps each customer's contribution at
    its distinct-part count. At 100 TB a whale-customer basket is the
    hot block: cap basket size or salt the customer key (the
    skewsafe_pair_gen shape) — the fixture's baskets are bounded, so
    the plain equi-join is the right plan here."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # One aggregation per customer (collect_set folds the DISTINCT into the
    # same shuffle), then C(n,2) ordered pairs generated JVM-side from the
    # sorted basket array — the self-join form shuffles the basket table
    # twice and pays join machinery for pairs this transform emits directly.
    # sort_array makes p1 < p2 by construction. Pair VOLUME is identical
    # (sum of per-customer basket²) — this changes the constant, not the
    # asymptotics.
    basket = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    # The basket table is compact (one row per customer), so AQE coalesces
    # it to a couple of partitions — but the explode below expands each row
    # to C(basket,2) pairs, and that expansion must run WIDE. Round-robin
    # the cheap side so the quadratic work spreads across the cluster (the
    # explode-side twin of fan_out's scan rule).
    basket = basket.repartition(spark.sparkContext.defaultParallelism)
    pair = F.explode(
        F.flatten(
            F.transform(
                "parts",
                lambda x, i: F.transform(
                    F.slice("parts", i + F.lit(2), F.size("parts")),
                    lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                ),
            )
        )
    )
    return (
        basket.select(pair.alias("pr"))
        .select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_customers"))
        .where(F.col("n_customers") >= COPURCHASE_MIN_SUPPORT)
        .orderBy(F.desc("n_customers"), F.asc("p1"), F.asc("p2"))
        .limit(COPURCHASE_TOPK)
    )


# --- T-keyset: keyset pagination (the scale-safe OFFSET) ----------------------
PAGE_SIZE = 25


def _keyset_oracle() -> str:
    # Page 3's anchor = the last row of page 2, derived the same way a real
    # API would: by running the first two pages. The oracle reproduces the
    # anchor with a scalar subquery so both engines paginate identically.
    return f"""
    WITH ordered AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS rn
        FROM orders
    )
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM ordered
    WHERE rn > {2 * PAGE_SIZE} AND rn <= {3 * PAGE_SIZE}
    ORDER BY o_totalprice DESC, o_orderkey
    """


@query("keyset_pagination", oracle=_keyset_oracle(), tags=("T2", "keyset"))
def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination — page 3 of the price-ranked order
    feed WITHOUT the OFFSET anti-pattern: the query seeks past the
    previous page's last (price, key) anchor tuple and takes the next
    PAGE_SIZE rows, so cost is one pushed-down range filter + a bounded
    top-k, independent of page depth — where OFFSET n scans and
    discards n rows (at page 10,000 of a 100 TB feed, that difference
    is the whole query). The anchor is computed here exactly as an API
    server stores it: the tail of the prior page's bounded top-k (a tiny
    driver-side lookup of 1 row, the same bounded pattern as the
    idempotency guards). The composite (price DESC, key ASC) tuple-seek
    predicate makes the cut deterministic under price ties; the oracle
    replays the same page via row-number bounds."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    page2 = (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(2 * PAGE_SIZE)
        .orderBy(F.asc("o_totalprice"), F.desc("o_orderkey"))
        .limit(1)
    )
    rows = page2.collect()
    if not rows:
        # Empty feed (or fewer than two pages): page 3 is empty — keep the
        # schema by seeking past an impossible anchor.
        ap, ak = float("-inf"), 0
    else:
        ap, ak = rows[0]["o_totalprice"], rows[0]["o_orderkey"]
    seek = (F.col("o_totalprice") < F.lit(ap)) | (
        (F.col("o_totalprice") == F.lit(ap)) & (F.col("o_orderkey") > F.lit(ak))
    )
    return (
        o.where(seek)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(PAGE_SIZE)
        .select("o_orderkey", "o_custkey", r2(F.col("o_totalprice")).alias("o_totalprice"))
    )


# --- fulfillment latency profile ----------------------------------------------
@query(
    "fulfillment_latency",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
                   AS days_to_ship
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(days_to_ship, 0.5), 4) AS p50_days,
           ROUND(quantile_cont(days_to_ship, 0.9), 4) AS p90_days,
           ROUND(SUM(CASE WHEN days_to_ship > 90 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS pct_late
    FROM lat
    GROUP BY o_orderpriority
    """,
    tags=("A12", "A13", "J4", "ops-analytics"),
)
def fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfillment latency profile — ship-lag percentiles and the
    late-rate per priority class, the SLA dashboard an operations team
    watches. One fact-fact join on the order key (the bucketable
    co-partition key), integer day lags, and per-priority exact
    percentiles via ``operators.ranks.grouped_exact_percentiles_discrete``:
    day lags are a CALENDAR-bounded integer domain, so exact percentiles
    fall out of one per-(priority, days) count aggregation — never a
    ``percentile()`` buffer holding a whole priority class's lags (5
    bounded keys whose GROUPS grow with the data — the 100× OOM shape,
    round-5 sweep), and never extra passes over the join. The
    late threshold is a conditional sum in the same aggregation;
    negative lags (data errors) are excluded upstream and surface in
    dq_audit's ship_before_order check instead."""
    from ..operators.ranks import (
        group_key,
        grouped_exact_percentiles_discrete,
        percentile_literal_map,
    )

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lat = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days_to_ship"),
        )
    )
    qs = grouped_exact_percentiles_discrete(
        lat, ["o_orderpriority"], "days_to_ship", [0.5, 0.9]
    )
    q = F.element_at(percentile_literal_map(qs), group_key("o_orderpriority"))
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("days_to_ship") > 90, 1).otherwise(0)).alias("_late"),
    ).select(
        "o_orderpriority",
        "n",
        r4(q[0]).alias("p50_days"),
        r4(q[1]).alias("p90_days"),
        r4(F.col("_late") * F.lit(1.0) / F.col("n")).alias("pct_late"),
    )


# --- duplicate-order detection ------------------------------------------------
@query(
    "duplicate_order_scan",
    oracle="""
    SELECT a.o_orderkey AS k1, b.o_orderkey AS k2, a.o_custkey,
           CAST(a.o_orderdate AS DATE) AS order_day,
           ROUND(a.o_totalprice, 2) AS amount1,
           ROUND(b.o_totalprice, 2) AS amount2,
           ROUND(least(a.o_totalprice, b.o_totalprice)
                 / greatest(a.o_totalprice, b.o_totalprice), 4) AS amount_ratio
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND CAST(a.o_orderdate AS DATE) = CAST(b.o_orderdate AS DATE)
     AND a.o_orderkey < b.o_orderkey
    """,
    tags=("J2", "fraud", "ops-analytics"),
)
def duplicate_order_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate/split-order detection — the same customer placing
    multiple orders on the same calendar day, with the amount ratio as
    the triage signal (ratio near 1 suggests a double-submit, a low
    ratio a deliberate split). Candidate generation is a pure EQUI-join
    on the (customer, day) composite — pair volume is bounded by
    per-customer daily order multiplicity (tiny by construction), the
    key-ordered orientation emits each pair once, and positive amounts
    make the least/greatest ratio division safe. At 100 TB this is a
    self-join on a high-cardinality composite key — no window, no
    sort; the same blocked-pair arithmetic as fuzzy_dedup_edit."""
    o = t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("k1"),
        "o_custkey",
        F.to_date("o_orderdate").alias("order_day"),
        F.col("o_totalprice").alias("p1"),
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("ck2"),
        F.to_date("o_orderdate").alias("day2"),
        F.col("o_totalprice").alias("p2"),
    )
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("ck2"))
            & (F.col("order_day") == F.col("day2"))
            & (F.col("k1") < F.col("k2")),
        )
        .select(
            "k1",
            "k2",
            "o_custkey",
            "order_day",
            r2(F.col("p1")).alias("amount1"),
            r2(F.col("p2")).alias("amount2"),
            r4(
                F.least(F.col("p1"), F.col("p2"))
                / F.greatest(F.col("p1"), F.col("p2"))
            ).alias("amount_ratio"),
        )
    )


# --- revenue Pareto curve (ABC analysis) --------------------------------------
PARETO_TOPK = 100


@query(
    "revenue_pareto_curve",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(FLOOR(SUM(o_totalprice) * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(cents) AS total_cents FROM per_cust),
    ranked AS (
        SELECT o_custkey, cents,
               ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rnk
        FROM per_cust
    )
    SELECT rnk, o_custkey,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(cents) OVER (ORDER BY rnk
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 * 1.0 / tot.total_cents, 4) AS cum_share,
           CASE WHEN CAST(SUM(cents) OVER (ORDER BY rnk
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     * 1.0 / tot.total_cents <= 0.5 THEN 'A'
                WHEN CAST(SUM(cents) OVER (ORDER BY rnk
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     * 1.0 / tot.total_cents <= 0.8 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked, tot
    WHERE rnk <= {PARETO_TOPK}
    """,
    tags=("T1", "W11", "ops-analytics"),
)
def revenue_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto/ABC) curve — the top-{PARETO_TOPK}
    customers ranked by lifetime revenue with each rank's cumulative
    share of TOTAL revenue and its ABC class (A ≤ 50%, B ≤ 80%, C
    beyond): the account-management classic that shows how few
    customers carry the book. Scale discipline: per-customer revenue is
    one hash aggregation; the global top-k BOUNDS the ranked set before
    the unpartitioned cumulative window touches it (the vocab_coverage
    pattern — the window runs over k rows, never the customer
    universe); amounts cumulate as integer CENTS (the ltv_cohort_curve
    window-sum-order trap); the grand total is a 1-row broadcast. Ranks
    tie-break on the customer key so both engines cut and label
    identical rows."""
    o = t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.floor(F.sum("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents")
    )
    tot = per_cust.agg(F.sum("cents").alias("total_cents"))
    w = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        per_cust.orderBy(F.desc("cents"), F.asc("o_custkey"))
        .limit(PARETO_TOPK)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("cents"), F.asc("o_custkey")))
            .cast("long"),
        )
    )
    cum = F.sum("cents").over(w).cast("long") * F.lit(1.0) / F.col("total_cents")
    return ranked.join(F.broadcast(tot)).select(
        "rnk",
        "o_custkey",
        r2(F.col("cents") / F.lit(100.0)).alias("revenue"),
        r4(cum).alias("cum_share"),
        F.when(cum <= 0.5, "A").when(cum <= 0.8, "B").otherwise("C").alias("abc_class"),
    )


# --- revenue inequality: per-nation Gini coefficient --------------------------
@query(
    "revenue_gini_by_nation",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_nationkey,
               o.o_custkey,
               CAST(FLOOR(SUM(o.o_totalprice) * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT c_nationkey, cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                       ORDER BY cents, o_custkey) AS BIGINT) AS i,
               CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n
        FROM per_cust
    )
    SELECT n.n_name AS nation,
           CAST(MAX(r.n) AS BIGINT) AS n_customers,
           ROUND(SUM(r.cents) / 100.0, 2) AS total_revenue,
           ROUND(SUM((2 * r.i - r.n - 1) * r.cents) * 1.0
                 / (MAX(r.n) * SUM(r.cents)), 4) AS gini
    FROM ranked r JOIN nation n ON n.n_nationkey = r.c_nationkey
    GROUP BY n.n_name
    HAVING MAX(r.n) >= 2
    """,
    tags=("A9", "W11", "inequality"),
)
def revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue inequality per nation — the Gini coefficient of customer
    lifetime value, computed from the rank formula
    G = Σ(2i − n − 1)·xᵢ / (n·Σxᵢ) over ascending-ranked customers.
    EVERYTHING left of the final division is INTEGER: revenues become
    cents (bigint), ranks and counts are bigint, so the numerator and
    denominator are exact under any accumulation order on both engines
    (the window-sum-order trap again, solved by construction — terms
    peak ~1e10 and sums ~1e13, far inside bigint). The ranking window
    partitions by NATION, so no global sort exists at any scale; ties
    break on the customer key. Degenerate one-customer nations drop."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation")
    per_cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.floor(F.sum("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"))
    )
    wrank = Window.partitionBy("c_nationkey").orderBy("cents", "o_custkey")
    wpart = Window.partitionBy("c_nationkey")
    ranked = per_cust.select(
        "c_nationkey",
        "cents",
        F.row_number().over(wrank).cast("long").alias("i"),
        F.count("*").over(wpart).cast("long").alias("n"),
    )
    term = (F.lit(2) * F.col("i") - F.col("n") - F.lit(1)) * F.col("cents")
    return (
        ranked.join(F.broadcast(n), ranked["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            r2(F.sum("cents") / F.lit(100.0)).alias("total_revenue"),
            r4(
                F.sum(term) * F.lit(1.0) / (F.max("n") * F.sum("cents"))
            ).alias("gini"),
        )
        .where(F.col("n_customers") >= 2)
    )


# --- ALS half-step: per-user factor solve against fixed item factors ----------
# One alternating-least-squares M-step of rank-2 implicit matrix
# factorization, written as pure relational algebra: item factors are a
# fixed md5-derived table (the engine contract is the SOLVE shape — the
# same closed-form normal-equations pass runs against trained factors),
# user factors come from the explicit 2x2 inverse. Every aggregated term
# is an exact dyadic rational (numerator/2^30 with bounded numerators),
# so the moment sums are order-independent IEEE-exact on both engines;
# floats only enter in the final fixed-shape solve expressions.
ALS_LAMBDA = 0.1


def _als_hex4(instr_fn: str, h: str) -> str:
    hx = lambda i: f"({instr_fn}('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
    return f"(4096 * {hx(1)} + 256 * {hx(2)} + 16 * {hx(3)} + {hx(4)})"


def _als_factor_sql(instr_fn: str, comp: int, key: str, str_t: str = "VARCHAR") -> str:
    h = f"md5(concat('als|{comp}|', CAST({key} AS {str_t})))"
    # 32768E0: a bare `32768.0` parses as DECIMAL in Spark SQL text and
    # decimal division rounds (~1e-10) — scientific notation stays DOUBLE.
    return f"(({_als_hex4(instr_fn, h)} - 32768) / 32768E0)"


def _als_oracle() -> str:
    v1 = _als_factor_sql("strpos", 1, "part")
    v2 = _als_factor_sql("strpos", 2, "part")
    lam = f"{ALS_LAMBDA}E0"
    det = f"((a11 + {lam}) * (a22 + {lam}) - a12 * a12)"
    return f"""
    WITH rr AS (
        SELECT o.o_custkey AS cust, l.l_partkey AS part,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS rq
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    f AS (
        SELECT cust, rq, {v1} AS v1, {v2} AS v2 FROM rr
    ),
    s AS (
        SELECT cust, COUNT(*) AS n_items,
               SUM(v1 * v1) AS a11, SUM(v1 * v2) AS a12, SUM(v2 * v2) AS a22,
               SUM(rq * v1) AS b1, SUM(rq * v2) AS b2
        FROM f GROUP BY 1
    )
    SELECT cust AS cust_id, CAST(n_items AS BIGINT) AS n_items,
           ROUND(((a22 + {lam}) * b1 - a12 * b2) / {det}, 6) AS x1,
           ROUND(((a11 + {lam}) * b2 - a12 * b1) / {det}, 6) AS x2
    FROM s
    """


@query("als_half_step", oracle=_als_oracle(), tags=("recsys", "als", "A9"))
def als_half_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-2 ALS user-factor solve: ratings = per-(customer, part)
    ordered quantity; item factors v ∈ R² derived from md5 (exact
    n/2^15 rationals); per user solve (Σ v vᵀ + λI) x = Σ r·v by the
    explicit 2×2 inverse. The same bounded-iteration-as-operator
    contract as `kmeans_lloyd_step`: a full ALS training run is a
    driver loop alternating this step over users and items. Plan shape
    at 100 TB: one fact-fact equi-join (orders ⋈ lineitem, both
    shuffled on orderkey), one map-side-combinable moment aggregation
    per user, zero driver-side math — the normal-equation sums are
    decomposable aggregates, so the whole M-step is one shuffle past
    the ratings join. Exactness: every summed term is a dyadic
    rational with common denominator 2^30 and bounded numerator, so
    float accumulation order cannot change the sums; divisions happen
    once per user in fixed-shape expressions (det ≥ λ² > 0 by PSD+λI,
    no guard needed)."""
    v1 = F.expr(_als_factor_sql("instr", 1, "part", str_t="STRING"))
    v2 = F.expr(_als_factor_sql("instr", 2, "part", str_t="STRING"))
    ratings = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("cust"), "o_orderkey")
        .join(
            t(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey"),
                F.col("l_partkey").alias("part"),
                F.col("l_quantity").cast("long").alias("q"),
            ),
            "o_orderkey",
        )
        .groupBy("cust", "part")
        .agg(F.sum("q").alias("rq"))
    )
    f = ratings.select("cust", "rq", v1.alias("v1"), v2.alias("v2"))
    s = f.groupBy("cust").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("v1") * F.col("v1")).alias("a11"),
        F.sum(F.col("v1") * F.col("v2")).alias("a12"),
        F.sum(F.col("v2") * F.col("v2")).alias("a22"),
        F.sum(F.col("rq") * F.col("v1")).alias("b1"),
        F.sum(F.col("rq") * F.col("v2")).alias("b2"),
    )
    lam = F.lit(ALS_LAMBDA)
    det = (F.col("a11") + lam) * (F.col("a22") + lam) - F.col("a12") * F.col("a12")
    return s.select(
        F.col("cust").alias("cust_id"),
        "n_items",
        r6(((F.col("a22") + lam) * F.col("b1") - F.col("a12") * F.col("b2")) / det).alias("x1"),
        r6(((F.col("a11") + lam) * F.col("b2") - F.col("a12") * F.col("b1")) / det).alias("x2"),
    )
