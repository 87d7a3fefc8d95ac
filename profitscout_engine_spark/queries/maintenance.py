"""Warehouse-maintenance operators: the ops surface a table-owning
pipeline runs around its data — one-pass column profiling, snapshot
diffing (CDC), incremental materialized-view maintenance via
partial-aggregate merge, and SCD-type-2 history construction.

Reference provenance (behavioral, not code): the reference rebuilds its
ledgers by truncate-and-reload (scripts/ledger_and_tracking/
reset_forward_paper_ledger_v3.sql) and patches outcome columns with
batched UPDATEs (win-tracker/main.py:333-348) — the imperative forms of
snapshot diff and incremental maintenance; audit EDA scripts
(backtesting_and_research/) eyeball column distributions by hand, which
``table_profile`` systematizes.

Scale notes (100 TB): the profile is ONE aggregation pass over the
table (exact distincts ride Spark's expand-based multi-distinct);
snapshot diff is a single full-outer join on the snapshot key;
incremental maintenance merges a delta's partial aggregates into the
base view's partials — the whole point is NOT rescanning the base
table; SCD2 is one per-key window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import r2, r4, r6
from ..operators.ranks import with_avg_rank
from . import query
from ._oracle import exact_quantile_bounds_sql
from ._util import t

# --- one-pass column profile --------------------------------------------------
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "table_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               MIN({c}) * 1.0 AS min_val,
               MAX({c}) * 1.0 AS max_val,
               ROUND(SUM({c}) / COUNT({c}), 4) AS mean_val
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    tags=("maintenance", "profile", "A-agg"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-column profile (rows, nulls, distincts, min/max/mean) of
    the fact table's numeric columns in ONE aggregation job, unpivoted to
    the long (column_name, stats...) form a data-quality monitor stores.
    Exact distinct counts over several columns ride Spark's expand-based
    multi-distinct rewrite — still a single shuffle per distinct column
    group with partial aggregation, no per-column table rescans. Mean is
    SUM/COUNT (not AVG) so both engines evaluate the identical division."""
    li = t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            r4(F.sum(c) / F.count(c)).alias(f"{c}__mean"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__dist, CAST({c}__min AS DOUBLE), "
        f"CAST({c}__max AS DOUBLE), {c}__mean"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_val, max_val, mean_val)"
    )


# --- snapshot diff (CDC between two table versions) ---------------------------
# v2 is a deterministic transform of orders so both engines derive the same
# "next snapshot": urgent finished orders deleted, every 13th repriced,
# every 101st re-keyed negative (an insert).
_V2_SQL = """
        SELECT o_orderkey, o_totalprice * 1.05 AS o_totalprice
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 97 = 0)
          AND o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 97 = 0)
          AND o_orderkey % 13 <> 0
        UNION ALL
        SELECT -o_orderkey AS o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderkey % 101 = 0
"""


@query(
    "snapshot_diff",
    oracle=f"""
    WITH v2 AS ({_V2_SQL}),
    d AS (
        SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                    WHEN v2.o_orderkey IS NULL THEN 'delete'
                    WHEN v1.o_totalprice <> v2.o_totalprice THEN 'update'
                    ELSE 'same' END AS change_type,
               COALESCE(v2.o_totalprice, 0.0) - COALESCE(v1.o_totalprice, 0.0) AS delta
        FROM (SELECT o_orderkey, o_totalprice FROM orders) v1
        FULL OUTER JOIN v2 USING (o_orderkey)
    )
    SELECT change_type, COUNT(*) AS n, ROUND(SUM(delta), 2) AS price_delta
    FROM d GROUP BY change_type
    """,
    tags=("maintenance", "cdc", "J-join"),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture diff between two snapshots of the orders table
    (v2 is a deterministic transform: deletes, updates, inserts): one
    full-outer join on the snapshot key classifies every row into
    insert/delete/update/same and rolls up counts and value drift. This
    is the audit query behind any incremental-publish pipeline — at
    scale it is one co-partitioned join on the primary key (bucketing
    both snapshots on the key makes it shuffle-free)."""
    orders = t(spark, sf_dir, "orders")
    v1 = orders.select("o_orderkey", "o_totalprice")
    keep = ~((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 97 == 0))
    v2 = (
        orders.where(keep)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") * 1.05)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionAll(
            orders.where(F.col("o_orderkey") % 101 == 0).select(
                (-F.col("o_orderkey")).alias("o_orderkey"), "o_totalprice"
            )
        )
    )
    j = v1.alias("v1").join(v2.alias("v2"), "o_orderkey", "full_outer")
    change = (
        F.when(F.col("v1.o_totalprice").isNull(), F.lit("insert"))
        .when(F.col("v2.o_totalprice").isNull(), F.lit("delete"))
        .when(F.col("v1.o_totalprice") != F.col("v2.o_totalprice"), F.lit("update"))
        .otherwise(F.lit("same"))
    )
    delta = F.coalesce(F.col("v2.o_totalprice"), F.lit(0.0)) - F.coalesce(
        F.col("v1.o_totalprice"), F.lit(0.0)
    )
    return (
        j.select(change.alias("change_type"), delta.alias("delta"))
        .groupBy("change_type")
        .agg(F.count("*").alias("n"), r2(F.sum("delta")).alias("price_delta"))
    )


# --- incremental materialized-view maintenance --------------------------------
_CUTOFF = "DATE '1999-01-01'"


@query(
    "incremental_agg_maintain",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_revenue,
           ROUND(SUM(o_totalprice) / COUNT(*), 2) AS avg_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("maintenance", "incremental", "A1"),
)
def incremental_agg_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the revenue-by-priority
    view is held as MERGEABLE partials (count, sum) built from the base
    period, then a late-arriving delta batch's partials are merged in —
    count+count, sum+sum — and finalized (avg = merged sum / merged
    count). The oracle recomputes from scratch over the full table;
    equality IS the maintenance-correctness proof. At 100 TB this is the
    pattern that turns a nightly full-table rescan into a delta-sized
    job: the base partials are a tiny stored table, only the delta is
    scanned."""
    orders = t(spark, sf_dir, "orders")
    cutoff = F.to_timestamp(F.lit("1999-01-01"))
    partial = lambda df: df.groupBy("o_orderpriority").agg(  # noqa: E731
        F.count("*").alias("p_n"), F.sum("o_totalprice").alias("p_sum")
    )
    base = partial(orders.where(F.col("o_orderdate") < cutoff))
    delta = partial(orders.where(F.col("o_orderdate") >= cutoff))
    merged = (
        base.select("o_orderpriority", "p_n", "p_sum")
        .unionAll(delta.select("o_orderpriority", "p_n", "p_sum"))
        .groupBy("o_orderpriority")
        .agg(F.sum("p_n").alias("n_orders"), F.sum("p_sum").alias("rev"))
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        r2(F.col("rev")).alias("total_revenue"),
        r2(F.col("rev") / F.col("n_orders")).alias("avg_revenue"),
    )


# --- SCD type-2 history from a change stream ----------------------------------
@query(
    "scd2_history",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_type,
               CASE WHEN event_type IS DISTINCT FROM
                         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                    THEN 1 ELSE 0 END AS chg
        FROM events
    ),
    runs AS (
        SELECT user_id, ts, event_type,
               CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version_n
        FROM flagged
    ),
    hist AS (
        SELECT user_id, event_type, version_n,
               MIN(ts) AS valid_from,
               COUNT(*) AS n_events
        FROM runs GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type, version_n, valid_from,
           COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version_n),
                    TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version_n)
               IS NULL AS is_current,
           n_events
    FROM hist
    """,
    tags=("maintenance", "scd2", "W-window"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 table built from the event stream:
    consecutive runs of each entity's attribute value collapse into
    versioned validity intervals [valid_from, valid_to) with an open
    current row — gaps-and-islands (lag-flag + running sum) followed by
    one interval rollup and a lead for the closing edge. Everything
    partitions on the entity key; the history table is the standard
    dimension-tracking artifact every warehouse maintains."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    wl = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(wl)), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "version_n",
        F.sum("chg").over(wl.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    hist = runs.groupBy("user_id", "event_type", "version_n").agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy("version_n")
    nxt = F.lead("valid_from").over(wv)
    # Open rows close at a far-future sentinel (2200-01-01, inside pandas' ns range) instead of NULL: the
    # interval stays half-open and range probes need no NULL branch (and a
    # NULL-free timestamp column also dodges pandas' NaT-vs-resolution
    # comparison artifact in typed hash comparators).
    return hist.select(
        "user_id",
        "event_type",
        "version_n",
        "valid_from",
        F.coalesce(nxt, F.lit("2200-01-01 00:00:00").cast("timestamp")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "n_events",
    )


# --- cohort retention matrix --------------------------------------------------
@query(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    mat AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT)
                   AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM active a JOIN first_seen f USING (user_id)
        GROUP BY 1, 2
    ),
    sz AS (
        SELECT cohort_week, COUNT(*) AS cohort_size
        FROM first_seen GROUP BY 1
    )
    SELECT m.cohort_week, m.week_offset, m.n_active, s.cohort_size,
           ROUND(m.n_active * 1.0 / s.cohort_size, 4) AS retention
    FROM mat m JOIN sz s USING (cohort_week)
    """,
    tags=("maintenance", "retention", "A-agg"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by first-active week,
    tracked by distinct-active weeks since, with the retention rate
    against the cohort size. Three aggregations, each a single shuffle
    on a bounded key (user, then cohort×offset — calendar-sized, tiny
    next to the event volume); the cohort-size table joins back via
    broadcast. The product-analytics staple every event warehouse
    serves."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    mat = (
        active.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sz = first_seen.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return mat.join(sz, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        r4(F.col("n_active") * F.lit(1.0) / F.col("cohort_size")).alias("retention"),
    )


# --- hot-key skew report ------------------------------------------------------
SKEW_TOPK = 10


@query(
    "key_skew_report",
    oracle=f"""
    WITH counts AS (
        SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM counts
    ),
    topk AS (
        SELECT key, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank
        FROM counts QUALIFY rank <= {SKEW_TOPK}
    )
    SELECT t.key, t.rank, t.cnt,
           ROUND(t.cnt * 100.0 / x.total, 4) AS share_pct,
           ROUND(t.cnt * 1.0 * x.n_keys / x.total, 4) AS skew_ratio,
           ROUND(SUM(t.cnt) OVER (ORDER BY t.rank ROWS UNBOUNDED PRECEDING)
                 * 100.0 / x.total, 4) AS cum_share_pct
    FROM topk t CROSS JOIN tot x
    """,
    tags=("maintenance", "skew", "T-topk"),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis for a join/aggregation key: the SKEW_TOPK hottest
    keys with their share of rows, skew ratio versus a uniform key
    (cnt·n_keys/total — 1.0 means perfectly balanced), and the running
    share of the head. This is the query an operator runs BEFORE picking
    a salting factor (operators/skew.py) or enabling AQE skew-join for a
    key. One count aggregation, a distributed top-K (orderBy+limit —
    never a full sort), a 1-row scalar broadcast, and a 10-row window."""
    counts = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count("*").alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").cast("long").alias("total"), F.count("*").alias("n_keys")
    )
    topk = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(SKEW_TOPK)
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    ranked = topk.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("key"))).cast("long"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "rank",
            "cnt",
            r4(F.col("cnt") * 100.0 / F.col("total")).alias("share_pct"),
            r4(F.col("cnt") * 1.0 * F.col("n_keys") / F.col("total")).alias("skew_ratio"),
            r4(
                F.sum("cnt").over(w) * 100.0 / F.col("total")
            ).alias("cum_share_pct"),
        )
    )


# --- information-theoretic column profiling -----------------------------------
@query(
    "column_entropy",
    oracle="""
    WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c),
    hx AS (
        SELECT SUM(-(n * 1.0 / t) * ln(n * 1.0 / t) / ln(2)) AS h
        FROM c CROSS JOIN tot
    ),
    ch AS (
        SELECT EXTRACT(hour FROM ts) AS hr, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    chn AS (SELECT hr, CAST(SUM(n) AS BIGINT) AS nh FROM ch GROUP BY 1),
    hc AS (
        SELECT SUM((nh * 1.0 / t)
                   * (-(n * 1.0 / nh) * ln(n * 1.0 / nh) / ln(2))) AS h
        FROM ch JOIN chn USING (hr) CROSS JOIN tot
    )
    SELECT 'entropy_event_type' AS measure, ROUND(hx.h, 6) AS bits FROM hx
    UNION ALL
    SELECT 'cond_entropy_given_hour', ROUND(hc.h, 6) FROM hc
    UNION ALL
    SELECT 'mutual_information', ROUND(hx.h - hc.h, 6) FROM hx CROSS JOIN hc
    """,
    tags=("maintenance", "profile", "entropy"),
)
def column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-theoretic column profile: Shannon entropy of the
    event-type distribution, its conditional entropy given hour-of-day,
    and their difference (mutual information — how much the clock
    predicts the event mix; the drift/feature-relevance statistic a
    monitoring pipeline tracks). All probabilities are exact count
    ratios; the log2 folds run over category×hour cells (bounded,
    tiny), so the profile costs two small aggregations no matter how
    many rows stream through. The 1-row totals ride broadcast cross
    joins."""
    from ..exprs import r6

    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").cast("long").alias("t"))
    log2 = float(__import__("math").log(2.0))
    p = F.col("n") * 1.0 / F.col("t")
    hx = (
        c.crossJoin(F.broadcast(tot))
        .agg(F.sum(-p * F.log(p) / log2).alias("h"))
    )
    ch = ev.groupBy(
        F.hour("ts").alias("hr"), "event_type"
    ).agg(F.count("*").alias("n"))
    chn = ch.groupBy("hr").agg(F.sum("n").cast("long").alias("nh"))
    pt = F.col("n") * 1.0 / F.col("nh")
    hc = (
        ch.join(chn, "hr")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum((F.col("nh") * 1.0 / F.col("t")) * (-pt * F.log(pt) / log2)).alias("h"))
    )
    hxv = hx.select(F.lit("entropy_event_type").alias("measure"), r6(F.col("h")).alias("bits"))
    hcv = hc.select(F.lit("cond_entropy_given_hour").alias("measure"), r6(F.col("h")).alias("bits"))
    mi = (
        hx.crossJoin(hc.select(F.col("h").alias("h2")))
        .select(
            F.lit("mutual_information").alias("measure"),
            r6(F.col("h") - F.col("h2")).alias("bits"),
        )
    )
    return hxv.unionAll(hcv).unionAll(mi)


# --- data-quality audit: one report row per invariant -------------------------
@query(
    "dq_audit",
    oracle="""
    SELECT 'orphan_lineitems' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'duplicate_order_keys',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'nonpositive_price',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'discount_out_of_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'ship_before_order',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'customer_nation_orphans',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    """,
    tags=("maintenance", "data-quality", "J-anti"),
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the assertion suite a warehouse runs after
    every load, emitted as a report table (one row per invariant:
    checked count, violation count). Covers the failure classes the
    reference's diagnostics scripts probe ad hoc (schema/null checks,
    range sanity — scripts/tests_and_diagnostics/task1_verify_schema.py,
    check_liquidity.py): referential integrity as outer-join null
    counts (orphan facts, orphan dims), key uniqueness as
    count-vs-distinct, domain ranges as conditional sums, and
    cross-table temporal ordering. Each check is a single pruned
    scan-aggregate or one keyed join; the checks union into one report.
    At 100 TB each stays a partial→final agg — the joins shuffle on the
    same keys the tables are bucketed by, and a scheduler can run
    checks independently (the union is presentation, not a barrier)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    lng = lambda col: col.cast("long")  # noqa: E731

    def report(name: str, checked, violations) -> DataFrame:
        return F.lit(name).alias("check_name"), lng(checked).alias(
            "n_checked"
        ), lng(violations).alias("n_violations")

    orphan = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left")
        .agg(*report(
            "orphan_lineitems",
            F.count("*"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)),
        ))
    )
    dupkeys = o.agg(*report(
        "duplicate_order_keys",
        F.count("*"),
        F.count("*") - F.countDistinct("o_orderkey"),
    ))
    price = li.agg(*report(
        "nonpositive_price",
        F.count("*"),
        F.sum(F.when(F.col("l_extendedprice") <= 0.0, 1).otherwise(0)),
    ))
    disc = li.agg(*report(
        "discount_out_of_range",
        F.count("*"),
        F.sum(F.when((F.col("l_discount") < 0.0) | (F.col("l_discount") > 1.0), 1)
              .otherwise(0)),
    ))
    shiporder = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(*report(
            "ship_before_order",
            F.count("*"),
            F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)),
        ))
    )
    cust_nation = (
        c.join(F.broadcast(n.select("n_nationkey")),
               c["c_nationkey"] == n["n_nationkey"], "left")
        .agg(*report(
            "customer_nation_orphans",
            F.count("*"),
            F.sum(F.when(F.col("n_nationkey").isNull(), 1).otherwise(0)),
        ))
    )
    return orphan.unionAll(dupkeys).unionAll(price).unionAll(disc).unionAll(
        shiporder
    ).unionAll(cust_nation)


# --- Benford first-digit audit -------------------------------------------------
# log10(1 + 1/d) literals precomputed in Python so BOTH engines consume
# identical double constants (no cross-engine log in the query path).
BENFORD_EXPECTED = ((1, 0.3010299956639812), (2, 0.17609125905568124), (3, 0.12493873660829992), (4, 0.09691001300805642), (5, 0.07918124604762482), (6, 0.06694678963061322), (7, 0.05799194697768673), (8, 0.05115252244738129), (9, 0.04575749056067514))


@query(
    "benford_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS leading_digit
        FROM orders
        WHERE o_totalprice > 0.0
    ),
    obs AS (
        SELECT leading_digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM digits GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS total FROM obs),
    expected(leading_digit, p_expected) AS (
        VALUES {', '.join(f'({d}, {p!r}::DOUBLE)' for d, p in BENFORD_EXPECTED)}
    )
    SELECT CAST(e.leading_digit AS BIGINT) AS leading_digit,
           COALESCE(o.n, 0) AS n,
           ROUND(COALESCE(o.n, 0) * 1.0 / tot.total, 4) AS p_observed,
           ROUND(e.p_expected, 4) AS p_expected,
           ROUND(COALESCE(o.n, 0) * 1.0 / tot.total - e.p_expected, 4) AS deviation
    FROM expected e LEFT JOIN obs o ON o.leading_digit = e.leading_digit, tot
    """,
    tags=("maintenance", "data-quality", "benford"),
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the classic fabricated-data detector:
    organically-grown amounts follow log10(1+1/d); uniform or hand-
    entered values don't, and the per-digit deviation column is the
    alarm. Digit extraction is INTEGER-EXACT on both engines: amounts
    become round-half-up cents (bigint), whose decimal string leads
    with the digit — no log10 in the query path (engine libm drift),
    no double-to-string formatting (engine format drift); the expected
    shares are Python-precomputed literals both engines consume
    verbatim. One scan-aggregate into a 9-row broadcast-joined report;
    all nine digits always appear (expected-side LEFT join), so a
    digit with ZERO observations surfaces as the loudest deviation."""
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0.0)
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    digits = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("leading_digit")
    )
    obs = digits.groupBy("leading_digit").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    expected = spark.createDataFrame(
        list(BENFORD_EXPECTED), "leading_digit long, p_expected double"
    )
    n = F.coalesce(F.col("n"), F.lit(0).cast("long"))
    p_obs = n * F.lit(1.0) / F.col("total")
    return (
        expected.join(obs, "leading_digit", "left")
        .join(F.broadcast(tot))
        .select(
            "leading_digit",
            n.alias("n"),
            r4(p_obs).alias("p_observed"),
            r4(F.col("p_expected")).alias("p_expected"),
            r4(p_obs - F.col("p_expected")).alias("deviation"),
        )
    )


# --- distribution drift: month-over-month mix shift ----------------------------
@query(
    "mix_shift_monitor",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS mon, o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT mon, SUM(n) AS tn FROM monthly GROUP BY 1),
    shares AS (
        SELECT m.mon, m.grp, m.n, m.n * 1.0 / t.tn AS share
        FROM monthly m JOIN tot t ON t.mon = m.mon
    ),
    delta AS (
        SELECT mon, grp, n, share,
               share - LAG(share) OVER (PARTITION BY grp ORDER BY mon) AS d
        FROM shares
    )
    SELECT mon, ROUND(SUM(abs(d)) / 2.0, 4) AS tv_distance,
           CAST(SUM(n) AS BIGINT) AS n_rows
    FROM delta
    WHERE d IS NOT NULL
    GROUP BY mon
    """,
    tags=("maintenance", "drift", "A10"),
)
def mix_shift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor — month-over-month total-variation
    distance of the order-priority mix: TV = ½·Σ|share_t − share_{t−1}|,
    the alarm a data-quality pipeline fires when an upstream producer
    changes behavior (the L1 form of PSI, chosen because it needs no
    cross-engine ln). The share table is |months|×|groups| rows — the
    fact scan aggregates ONCE, every later step (total join, lag
    window per group, per-month fold) runs on that tiny matrix.
    Integer counts → exact ratios → stable-rounded distances. Months
    with no predecessor drop out (the first month has no baseline)."""
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("mon"),
        F.col("o_orderpriority").alias("grp"),
    ).agg(F.count("*").alias("n"))
    tot = monthly.groupBy("mon").agg(F.sum("n").alias("tn"))
    shares = monthly.join(tot, "mon").select(
        "mon", "grp", "n", (F.col("n") * F.lit(1.0) / F.col("tn")).alias("share")
    )
    w = Window.partitionBy("grp").orderBy("mon")
    delta = shares.withColumn("d", F.col("share") - F.lag("share").over(w))
    return (
        delta.where(F.col("d").isNotNull())
        .groupBy("mon")
        .agg(
            r4(F.sum(F.abs(F.col("d"))) / F.lit(2.0)).alias("tv_distance"),
            F.sum("n").cast("long").alias("n_rows"),
        )
    )


# --- RFM customer segmentation --------------------------------------------------
RFM_ASOF = "2001-09-01 00:00:00"


@query(
    "rfm_segmentation",
    oracle=f"""
    WITH rfm AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         TIMESTAMP '{RFM_ASOF}') AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               -- integral cents before the sum: a float group-sum
               -- accumulates in engine-specific order, and an
               -- ULP-divergent monetary under a quantile boundary flips
               -- the strict < score (bit at the 8x stress check)
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) / 100.0E0 AS monetary
        FROM orders
        WHERE o_orderdate < TIMESTAMP '{RFM_ASOF}'
        GROUP BY o_custkey
    ),
    {exact_quantile_bounds_sql("rfm", "recency_days", [0.25, 0.5, 0.75], "rqb")},
    {exact_quantile_bounds_sql("rfm", "frequency", [0.25, 0.5, 0.75], "fqb")},
    {exact_quantile_bounds_sql("rfm", "monetary", [0.25, 0.5, 0.75], "mqb")},
    -- Spark-percentile-parity quantiles (equal-collapse; see _oracle.py):
    -- quantile_cont's weighted sum over equal straddled values is an ULP
    -- off for the non-dyadic terms (0.75*monetary rounds), and the
    -- boundary feeds a strict < score comparison.
    bounds AS (
        SELECT rqb.qs AS rq, fqb.qs AS fq, mqb.qs AS mq
        FROM rqb, fqb, mqb
    )
    SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, ROUND(monetary, 2) AS monetary,
           CAST(4 - len(list_filter(bounds.rq, q -> q < recency_days)) AS BIGINT)
               AS r_score,
           CAST(1 + len(list_filter(bounds.fq, q -> q < frequency)) AS BIGINT)
               AS f_score,
           CAST(1 + len(list_filter(bounds.mq, q -> q < monetary)) AS BIGINT)
               AS m_score
    FROM rfm, bounds
    """,
    tags=("maintenance", "rfm", "A12", "A20"),
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quartile scores, the classic value-tiering every retention team
    runs. One aggregation produces the per-customer RFM triple (session-
    shared: three boundary passes and the scoring scan read it from one
    materialization); the nine quartile boundaries come from
    ``operators.ranks.exact_percentiles`` — distributed order
    statistics, never a ``percentile()`` buffer holding every
    customer's value (customers GROW with the data; the single-buffer
    form is the 100× OOM shape, round-5 sweep) — and each customer
    scores by a strict literal-boundary count (the equi_depth_histogram
    bucketing shape — no ntile, whose single-partition global window
    dies at warehouse scale). Recency inverts (recent = high score);
    ties land in the lower bucket identically on both engines."""
    import functools as _ft

    from ..operators.ranks import exact_percentiles
    from ._util import shared

    def _rfm_build() -> DataFrame:
        o = t(spark, sf_dir, "orders").where(
            F.col("o_orderdate") < F.lit(RFM_ASOF).cast("timestamp")
        )
        return o.groupBy("o_custkey").agg(
            F.datediff(
                F.lit(RFM_ASOF).cast("timestamp"), F.max("o_orderdate")
            ).cast("long").alias("recency_days"),
            F.count("*").alias("frequency"),
            # exact integer cents before the sum (8x-stress trap: float
            # group-sum order flips an ULP under a quartile boundary)
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0)
            ).alias("monetary"),
        )

    rfm = shared(spark, sf_dir, "rfm_triple", _rfm_build)
    probs = [0.25, 0.5, 0.75]

    def _score(col: str, invert: bool):
        bounds = exact_percentiles(rfm, col, probs)
        cnt = _ft.reduce(
            lambda acc, b: acc + F.when(F.lit(b) < F.col(col), 1).otherwise(0),
            bounds,
            F.lit(0),
        )
        return (F.lit(4) - cnt if invert else F.lit(1) + cnt).cast("long")

    return rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        r2(F.col("monetary")).alias("monetary"),
        _score("recency_days", invert=True).alias("r_score"),
        _score("frequency", invert=False).alias("f_score"),
        _score("monetary", invert=False).alias("m_score"),
    )


# --- LTV cohort triangle --------------------------------------------------------
@query(
    "ltv_cohort_curve",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    sized AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM firsts GROUP BY 1
    ),
    spend AS (
        SELECT f.cohort,
               CAST(date_diff('month', f.cohort,
                              date_trunc('month', o.o_orderdate)) AS BIGINT)
                   AS months_since,
               SUM(o.o_totalprice) AS rev
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT s.cohort, s.months_since, z.cohort_n,
           CAST(FLOOR(s.rev * 100.0 + 0.5) AS BIGINT) / 100.0 AS period_revenue,
           ROUND(SUM(CAST(FLOOR(s.rev * 100.0 + 0.5) AS BIGINT))
                     OVER (PARTITION BY s.cohort ORDER BY s.months_since
                           ROWS UNBOUNDED PRECEDING) / 100.0 / z.cohort_n, 2)
               AS cum_ltv_per_customer
    FROM spend s JOIN sized z ON z.cohort = s.cohort
    """,
    tags=("maintenance", "ltv", "A11", "W5"),
)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV cohort triangle — the monetary twin of retention_cohorts:
    cohort = first-order month, and each (cohort, months-since) cell
    carries the period revenue plus the running cumulative LTV per
    cohort member — the curve a growth team compares against
    acquisition cost. Plan: one shuffle computes first-order months,
    the fact re-joins on the customer key (same key → co-partitioned),
    the triangle is |cohorts|×|months| rows, and the cumulative window
    runs over that tiny matrix, never the fact. Cohort sizes join back
    so later-month cells divide by the FULL cohort (dormant customers
    still dilute LTV — the standard definition)."""
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    sized = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_n"))
    spend = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            (
                (F.year(F.date_trunc("month", "o_orderdate")) - F.year("cohort")) * 12
                + (F.month(F.date_trunc("month", "o_orderdate")) - F.month("cohort"))
            ).cast("long").alias("months_since"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return spend.join(sized, "cohort").select(
        "cohort",
        "months_since",
        "cohort_n",
        # integer CENTS make the cumulative exact under ANY accumulation
        # order — DuckDB's window sum uses a segment tree (pairwise adds),
        # Spark's a running total, and float cells drift a rounding boundary
        # between the two; bigint cells cannot.
        (F.floor(F.col("rev") * 100.0 + 0.5).cast("long") / F.lit(100.0)).alias(
            "period_revenue"
        ),
        r2(
            F.sum(F.floor(F.col("rev") * 100.0 + 0.5).cast("long")).over(w)
            / F.lit(100.0)
            / F.col("cohort_n")
        ).alias("cum_ltv_per_customer"),
    )


# --- chi-square independence test (drift significance) ------------------------
@query(
    "chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT hr, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM cells),
    terms AS (
        SELECT CAST(FLOOR(
                   ((cells.o - rt.r * ct.c * 1.0E0 / n.total)
                    * (cells.o - rt.r * ct.c * 1.0E0 / n.total))
                   / (rt.r * ct.c * 1.0E0 / n.total) * 1e9 + 0.5)
               AS BIGINT) AS t_1e9
        FROM cells JOIN rt USING (event_type) JOIN ct USING (hr), n
    )
    SELECT ROUND(CAST(SUM(t_1e9) AS BIGINT) / 1e9, 4) AS chi2,
           CAST(((SELECT COUNT(*) FROM rt) - 1)
                * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof
    FROM terms
    """,
    tags=("maintenance", "stats", "drift"),
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of the event-type mix against
    hour-of-day — the significance complement to column_entropy's mutual
    information (MI says HOW related; chi2 says whether the relation
    beats sampling noise). One contingency aggregation, row/column
    marginals re-aggregated from the tiny cell table (never a second
    fact scan), expected counts r·c/N from exact integers.

    Each cell's (o−e)²/e term is an identical double on both engines;
    the SUM across cells is where engines disagree (accumulation
    order), so terms are fixed to integral 1e-9 units first — the
    integer-cells rule from the NOTES trap log applied to a statistic
    instead of a currency."""
    ev = t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    rt = cells.groupBy("event_type").agg(F.sum("o").cast("long").alias("r"))
    ct = cells.groupBy("hr").agg(F.sum("o").cast("long").alias("c"))
    n = cells.agg(F.sum("o").cast("long").alias("total"))
    e = F.col("r") * F.col("c") * F.lit(1.0) / F.col("total")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    terms = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hr")
        .join(F.broadcast(n))
        .select(F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long").alias("t_1e9"))
    )
    dof = (
        rt.agg(F.count(F.lit(1)).alias("nr"))
        .join(ct.agg(F.count(F.lit(1)).alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"))
    )
    return (
        terms.agg(r4(F.sum("t_1e9") / F.lit(1e9)).alias("chi2"))
        .join(F.broadcast(dof))
        .select("chi2", "dof")
    )


# --- order-independent table checksum (migration/CDC validation) --------------
_ROW_MD5_SQL = (
    "md5(CAST(o_orderkey AS STRING) || '|' || CAST(o_custkey AS STRING)"
    " || '|' || o_orderstatus || '|' || CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5)"
    " AS BIGINT) AS STRING) || '|' || o_orderpriority)"
)


def _hexfold_sql(instr_fn: str, h: str) -> str:
    """60-bit integer from the first 15 hex chars of an md5 column —
    polynomial fold, no engine-specific hex conversion. ``h`` must be a
    cheap column reference: the fold reads it 15 times, so the md5 is
    computed ONCE in a prior projection (inlining the md5 call here
    cost 15 hash evaluations per row — 2.1 s -> 0.9 s at sf0.1)."""
    terms = " + ".join(
        f"CAST(({instr_fn}('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" AS BIGINT) * {16 ** i}"
        for i in range(15)
    )
    return f"({terms})"


@query(
    "table_checksum",
    oracle=f"""
    WITH hashed AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS part_year,
               {_ROW_MD5_SQL} AS h
        FROM orders
    )
    SELECT part_year,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor({_hexfold_sql('strpos', 'h')}) AS BIGINT) AS row_xor
    FROM hashed
    GROUP BY part_year
    """,
    tags=("maintenance", "checksum", "cdc"),
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition order-independent table checksum — the migration /
    replication / CDC validation primitive: XOR of canonical 60-bit row
    hashes plus the row count, per year partition. XOR is commutative
    and associative, so the aggregate is layout- and order-independent
    (identical across shuffles, engines, and file orders), and a single
    changed row flips the partition's checksum. Floats enter the hash
    as exact integer cents (engine float→string formatting differs);
    the hex→int fold uses the repo's instr bridge, no engine-specific
    conv(). Map-side combinable — at 100 TB this costs one scan and a
    25-row result, which is why it's the tool for 'did the copy
    match' instead of a row-by-row diff."""
    from ._util import fan_out

    # Narrow projection FIRST, then round-robin the single-split fixture
    # scan (fan_out is a no-op on a real multi-split table): the md5+fold
    # is CPU-bound per row, and one parquet split would hash the whole
    # table on one task.
    o = fan_out(spark, t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority", "o_orderdate",
    ))
    hashed = o.select(
        F.year("o_orderdate").cast("long").alias("part_year"),
        F.expr(_ROW_MD5_SQL).alias("h"),
    )
    return (
        hashed.groupBy("part_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor(F.expr(_hexfold_sql("instr", "h"))).cast("long").alias("row_xor"),
        )
    )


# --- Spearman rank correlation (robust monotone-association statistic) --------
@query(
    "spearman_rank_corr",
    oracle="""
    WITH rev AS (
        SELECT c.c_custkey,
               c.c_acctbal AS bal,
               SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    ),
    ranked AS (
        SELECT RANK() OVER (ORDER BY bal)
                   + (COUNT(*) OVER (PARTITION BY bal) - 1) / 2.0E0 AS rx,
               RANK() OVER (ORDER BY rev_cents)
                   + (COUNT(*) OVER (PARTITION BY rev_cents) - 1) / 2.0E0 AS ry
        FROM rev
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
               SUM(rx * ry) AS sxy
        FROM ranked
    )
    SELECT n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
               AS spearman_rho
    FROM m
    """,
    tags=("maintenance", "stats", "rank-correlation"),
)
def spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between customer account balance and
    realized order revenue — the robust (monotone, outlier-immune)
    complement to the moment-based Pearson machinery in beta/correlation.
    Ties get AVERAGE ranks (RANK() + (tie_count−1)/2, the standard
    Spearman treatment), revenue is summed as exact integer cents before
    ranking, and every moment sum is a sum of quarter-integers well
    under 2^53 — exactly representable doubles whose addition is
    order-independent, so the statistic is bit-identical cross-engine
    with no fixed-point dance. Scale shape: one join+rollup to the
    per-customer grain (which GROWS with the data — customers are not a
    bounded dimension), then two DISTRIBUTED exact-rank passes via
    ``operators.ranks.with_avg_rank`` (range partition + broadcast
    prefix offsets; no single-task global window), joined back on the
    customer key, one 1-row moment fold."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    rev = (
        c.join(o, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", F.col("c_acctbal").alias("bal"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            ).alias("rev_cents")
        )
    )
    rx = with_avg_rank(rev.select("c_custkey", "bal"), "bal", "rx")
    ry = with_avg_rank(rev.select("c_custkey", "rev_cents"), "rev_cents", "ry")
    ranked = rx.join(ry, "c_custkey").select("rx", "ry")
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("n", r4(num / den).alias("spearman_rho"))


# --- Kaplan-Meier survival curve over user churn -------------------------------
@query(
    "kaplan_meier_retention",
    oracle="""
    WITH u AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l
        FROM events GROUP BY 1
    ),
    m AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    s AS (SELECT f AS day, CAST(COUNT(*) AS BIGINT) AS n_start FROM u GROUP BY 1),
    e AS (SELECT l AS day, CAST(COUNT(*) AS BIGINT) AS n_end FROM u GROUP BY 1),
    d AS (
        SELECT l AS day, CAST(COUNT(*) AS BIGINT) AS n_churn
        FROM u CROSS JOIN m WHERE l < maxd GROUP BY 1
    ),
    spine AS (
        SELECT days.day,
               COALESCE(n_start, 0) AS ns, COALESCE(n_end, 0) AS ne,
               COALESCE(n_churn, 0) AS nd
        FROM days LEFT JOIN s USING (day) LEFT JOIN e USING (day)
                  LEFT JOIN d USING (day)
    ),
    risk AS (
        SELECT day, nd,
               CAST(SUM(ns) OVER (ORDER BY day) AS BIGINT)
                   - CAST(COALESCE(SUM(ne) OVER (
                         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS nr
        FROM spine
    ),
    km AS (
        SELECT day, nr, nd,
               exp(SUM(CASE WHEN nd > 0
                            THEN CAST(floor(ln((nr - nd) * 1.0E0 / nr) * 1e9
                                            + 0.5) AS BIGINT)
                            ELSE 0 END) OVER (ORDER BY day) / 1.0E9) AS surv
        FROM risk
    )
    SELECT day, nr AS n_risk, nd AS n_churn, ROUND(surv, 6) AS survival
    FROM km WHERE nd > 0
    """,
    tags=("maintenance", "survival", "retention", "W5"),
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user churn (Kaplan & Meier 1958):
    a user churns on their last-seen day unless still active on the
    corpus's final day (right-censored); the curve multiplies
    (1 - churns/at-risk) over event days — the retention statistic that
    handles censoring correctly where naive retention_cohorts ratios do
    not. At-risk counts come from running start/exit totals over the
    CALENDAR-bounded day spine (never a per-user window); the product
    accumulates as exp of a cumulative sum of ln factors SNAPPED to
    integer nano-units at birth (ADVICE r6 — each ln is a single IEEE op
    on exact BIGINT counts, identical on both engines; the snap makes the
    running total exact BIGINT, so no assumption about the engines'
    windowed-sum association order remains: the psi_drift/ndcg pattern).
    One user-level aggregation, three day-level aggregates, one
    broadcast scalar."""
    from ..exprs import r6

    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    u = ev.groupBy("user_id").agg(
        F.min("day").alias("f"), F.max("day").alias("l")
    )
    m = ev.agg(F.max("day").alias("maxd"))
    days = ev.select("day").distinct()
    s = u.groupBy(F.col("f").alias("day")).agg(
        F.count("*").cast("long").alias("ns")
    )
    e = u.groupBy(F.col("l").alias("day")).agg(
        F.count("*").cast("long").alias("ne")
    )
    d = (
        u.crossJoin(F.broadcast(m))
        .where(F.col("l") < F.col("maxd"))
        .groupBy(F.col("l").alias("day"))
        .agg(F.count("*").cast("long").alias("nd"))
    )
    spine = (
        days.join(s, "day", "left")
        .join(e, "day", "left")
        .join(d, "day", "left")
        .select(
            "day",
            F.coalesce("ns", F.lit(0)).alias("ns"),
            F.coalesce("ne", F.lit(0)).alias("ne"),
            F.coalesce("nd", F.lit(0)).alias("nd"),
        )
    )
    w = Window.orderBy("day")  # bounded: one row per calendar day
    risk = spine.select(
        "day",
        "nd",
        (
            F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
            - F.coalesce(
                F.sum("ne").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            )
        )
        .cast("long")
        .alias("nr"),
    )
    ln_nano = F.floor(
        F.log((F.col("nr") - F.col("nd")) * F.lit(1.0) / F.col("nr"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    km = risk.withColumn(
        "surv",
        F.exp(
            F.sum(
                F.when(F.col("nd") > 0, ln_nano).otherwise(F.lit(0).cast("long"))
            ).over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.lit(1e9)
        ),
    )
    return km.where(F.col("nd") > 0).select(
        "day",
        F.col("nr").alias("n_risk"),
        F.col("nd").alias("n_churn"),
        r6(F.col("surv")).alias("survival"),
    )


# --- population stability index: distribution drift between corpus halves ------
# PSI = sum_bins (p_i - q_i) * ln(p_i / q_i), the ML-ops drift metric. Add-one
# smoothed counts keep every bin's ratio finite; each bin's term is snapped to
# integer NANO-units before the cross-bin total (a 16-term float sum would be
# accumulation-order bait — trap-log rule), so the reported PSI is exact
# BIGINT arithmetic divided once for display.
PSI_BIN_WIDTH = 64
PSI_MAX_BIN = 15


def _psi_oracle() -> str:
    return f"""
    WITH binned AS (
        SELECT LEAST(n_chars // {PSI_BIN_WIDTH}, {PSI_MAX_BIN}) AS bin,
               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
        FROM documents
    ),
    counts AS (
        SELECT bin,
               CAST(SUM(is_a) AS BIGINT) + 1 AS ca,
               CAST(SUM(1 - is_a) AS BIGINT) + 1 AS cb
        FROM binned GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
        FROM counts
    ),
    terms AS (
        SELECT bin, ca, cb,
               CAST(FLOOR((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                          * ln(CAST(ca AS DOUBLE) / na
                               / (CAST(cb AS DOUBLE) / nb))
                          * 1000000000 + 0.5) AS BIGINT) AS t_nano
        FROM counts CROSS JOIN tot
    )
    SELECT bin, ca - 1 AS n_a, cb - 1 AS n_b,
           ROUND(t_nano / 1.0E9, 6) AS psi_term,
           ROUND(CAST(SUM(t_nano) OVER () AS BIGINT) / 1.0E9, 6) AS psi_total
    FROM terms
    """


@query(
    "psi_drift",
    oracle=_psi_oracle(),
    tags=("maintenance", "drift", "psi", "dq"),
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the doc_id-parity halves of the
    corpus over length bins — the drift gate an ML-ops pipeline runs
    before reusing a trained filter on a new snapshot (rule of thumb:
    PSI < 0.1 stable, > 0.25 drifted). Per-bin shares use add-one
    smoothing so empty bins stay finite; each (p - q) * ln(p/q) term is
    a short chain of identical IEEE ops on exact integer counts and is
    snapped to integer nano-units BEFORE the cross-bin total (the
    trap-log accumulation rule), so the reported total is exact. One
    scan, one bounded-bin hash aggregation, scalars on a 1-row
    broadcast; the total rides a window over the 16-row bin table."""
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    binned = d.select(
        F.least(
            F.expr(f"n_chars div {PSI_BIN_WIDTH}"),
            F.lit(PSI_MAX_BIN).cast("long"),
        ).alias("bin"),
        F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0).alias("is_a"),
    )
    counts = binned.groupBy("bin").agg(
        (F.sum("is_a").cast("long") + 1).alias("ca"),
        (F.sum(1 - F.col("is_a")).cast("long") + 1).alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    terms = counts.crossJoin(F.broadcast(tot)).withColumn(
        "t_nano",
        F.floor((pa - pb) * F.log(pa / pb) * 1_000_000_000 + F.lit(0.5)).cast(
            "long"
        ),
    )
    w = Window.partitionBy()  # bounded: 16 bin rows
    return terms.select(
        "bin",
        (F.col("ca") - 1).alias("n_a"),
        (F.col("cb") - 1).alias("n_b"),
        r6(F.col("t_nano") / F.lit(1.0e9)).alias("psi_term"),
        r6(F.sum("t_nano").over(w).cast("long") / F.lit(1.0e9)).alias("psi_total"),
    )


# --- declarative data-quality expectation audit ---------------------------------
@query(
    "expectation_audit",
    oracle="""
    WITH o AS (
        SELECT CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                   AS null_custkey,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS dup_orderkey,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
                    AS BIGINT) AS bad_status
        FROM orders
    ),
    l AS (
        SELECT CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                    AS BIGINT) AS qty_range,
               CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                    AS BIGINT) AS disc_range,
               CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0)
                    AS BIGINT) AS nonpos_price
        FROM lineitem
    ),
    orphans AS (
        -- standard FK semantics: NULL keys are never orphans (the adjacent
        -- completeness check owns them). The IS NOT NULL guard aligns the
        -- NOT IN with the engine's anti-join by construction — without it,
        -- NULL NOT IN (...) evaluates to NULL (row silently excluded) and
        -- a NULL c_custkey would collapse the whole count to 0.
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey IS NOT NULL)
    )
    SELECT chk AS check_name, violations, violations = 0 AS passed
    FROM (
        SELECT 'lineitem_discount_in_0_0.1' AS chk, disc_range AS violations FROM l
        UNION ALL SELECT 'lineitem_quantity_in_1_50', qty_range FROM l
        UNION ALL SELECT 'lineitem_extendedprice_positive', nonpos_price FROM l
        UNION ALL SELECT 'orders_custkey_complete', null_custkey FROM o
        UNION ALL SELECT 'orders_custkey_refs_customer', n FROM orphans
        UNION ALL SELECT 'orders_orderkey_unique', dup_orderkey FROM o
        UNION ALL SELECT 'orders_status_in_domain', bad_status FROM o
    ) u
    """,
    tags=("maintenance", "data-quality", "S16", "audit"),
)
def expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite — the warehouse
    pre-publish gate (completeness, uniqueness, value ranges, domain
    membership, positivity, referential integrity) evaluated in ONE
    aggregation pass per table plus one anti-join, reported as
    (check_name, violation count, passed). This is the Deequ/contract
    check a 100 TB ingest runs before flipping a partition live: every
    expectation is a conditional count that rides the same scan (no per-
    check re-scan), the uniqueness check is COUNT - COUNT(DISTINCT)
    (two-level hash agg, no window), and the foreign-key orphan probe is
    a LEFT ANTI join that AQE broadcasts when the dim side fits."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    oa = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).cast("long").alias("null_custkey"),
        (F.count("*") - F.countDistinct("o_orderkey")).cast("long").alias("dup_orderkey"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).cast("long").alias("bad_status"),
    )
    la = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).cast("long").alias("qty_range"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
        ).cast("long").alias("disc_range"),
        F.count(
            F.when(F.col("l_extendedprice") <= 0, 1)
        ).cast("long").alias("nonpos_price"),
    )
    orphans = (
        # standard FK semantics: NULL keys are never orphans — they belong
        # to the completeness check. An unguarded anti-join KEEPS NULL-key
        # rows (NULL equi-join never matches), diverging from the oracle's
        # NOT IN on any fixture with NULL custkeys.
        o.where(F.col("o_custkey").isNotNull())
        .join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rows = (
        la.select(F.lit("lineitem_discount_in_0_0.1").alias("check_name"),
                  F.col("disc_range").alias("violations"))
        .unionAll(la.select(F.lit("lineitem_quantity_in_1_50"),
                            F.col("qty_range")))
        .unionAll(la.select(F.lit("lineitem_extendedprice_positive"),
                            F.col("nonpos_price")))
        .unionAll(oa.select(F.lit("orders_custkey_complete"),
                            F.col("null_custkey")))
        .unionAll(orphans.select(F.lit("orders_custkey_refs_customer"),
                                 F.col("n")))
        .unionAll(oa.select(F.lit("orders_orderkey_unique"),
                            F.col("dup_orderkey")))
        .unionAll(oa.select(F.lit("orders_status_in_domain"),
                            F.col("bad_status")))
    )
    return rows.select(
        "check_name", "violations", (F.col("violations") == 0).alias("passed")
    )
