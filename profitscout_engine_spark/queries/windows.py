"""Window / time-series operators (SURVEY §2.5 W1-W12).

Ordering inside every per-entity window is ``(ts, event_id)`` — a total
order, so both engines rank identically. Frames are ROWS frames (the
reference's rolling indicators are row-count windows over trading bars).

Scale note: every window here partitions by a high-cardinality entity key
(user_id), so state per partition is bounded and the sort is local to each
entity — this is the shape that survives 100 TB. chrono_split's former
global ntile window is gone (round 5): its split point is now located
distributively (calendar-bounded date rollup + within-date distributed
rank), with the ntile form kept only as a differential twin in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..exprs import r2, r4
from ..operators.ranks import with_avg_rank
from . import query
from ._util import t

def w_series():
    """Per-entity bar ordering used by all series windows (lazy: Window
    specs need an active session)."""
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an OHLC-ish bar series (FIXTURES.md B3 mapping): value is
    the close; high/low are deterministic bands so oracle SQL stays simple."""
    return t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("close"),
        (F.col("value") * 1.02).alias("high"),
        (F.col("value") * 0.98).alias("low"),
    )


_BARS_SQL = """
    SELECT user_id, ts, event_id, value AS close,
           value * 1.02 AS high, value * 0.98 AS low
    FROM events
"""


# --- W1: rolling mean (SMA) ---------------------------------------------------
@query(
    "sma_window",
    oracle=f"""
    WITH bars AS ({_BARS_SQL})
    SELECT event_id,
           ROUND(AVG(close) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS sma_5,
           ROUND(AVG(close) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4) AS sma_20
    FROM bars
    """,
    tags=("W1",),
)
def sma_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir)
    return bars.select(
        "event_id",
        r4(F.avg("close").over(w_series().rowsBetween(-4, 0))).alias("sma_5"),
        r4(F.avg("close").over(w_series().rowsBetween(-19, 0))).alias("sma_20"),
    )


# --- W3: Bollinger bands (rolling mean ± 2σ) ----------------------------------
@query(
    "bollinger_bands",
    oracle=f"""
    WITH bars AS ({_BARS_SQL})
    SELECT event_id,
           ROUND(AVG(close) OVER w + 2 * STDDEV_SAMP(close) OVER w, 4) AS bb_upper,
           ROUND(AVG(close) OVER w - 2 * STDDEV_SAMP(close) OVER w, 4) AS bb_lower
    FROM bars
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    """,
    tags=("W3",),
)
def bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir)
    w = w_series().rowsBetween(-19, 0)
    mean, sd = F.avg("close").over(w), F.stddev_samp("close").over(w)
    return bars.select(
        "event_id",
        r4(mean + 2 * sd).alias("bb_upper"),
        r4(mean - 2 * sd).alias("bb_lower"),
    )


# --- W4: ATR-14 (true range needs lag of close) -------------------------------
@query(
    "atr_true_range",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    tr AS (
        SELECT user_id, ts, event_id,
               GREATEST(high - low,
                        ABS(high - LAG(close) OVER w),
                        ABS(low - LAG(close) OVER w)) AS true_range
        FROM bars
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id,
           ROUND(true_range, 4) AS true_range,
           ROUND(AVG(true_range) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 4) AS atr_14
    FROM tr
    """,
    tags=("W4",),
)
def atr_true_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir)
    prev_close = F.lag("close").over(w_series())
    true_range = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev_close),
        F.abs(F.col("low") - prev_close),
    )
    with_tr = bars.withColumn("true_range", true_range)
    return with_tr.select(
        "event_id",
        r4(F.col("true_range")).alias("true_range"),
        r4(F.avg("true_range").over(w_series().rowsBetween(-13, 0))).alias("atr_14"),
    )


# --- W5: cumulative signed sum (OBV) ------------------------------------------
@query(
    "obv_cumulative",
    oracle=f"""
    WITH bars AS ({_BARS_SQL}),
    signed AS (
        SELECT user_id, ts, event_id,
               CASE WHEN close > LAG(close) OVER w THEN close
                    WHEN close < LAG(close) OVER w THEN -close
                    ELSE 0 END AS signed_val
        FROM bars
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id,
           ROUND(SUM(signed_val) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING), 4) AS obv
    FROM signed
    """,
    tags=("W5",),
)
def obv_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir)
    prev = F.lag("close").over(w_series())
    signed = (
        F.when(F.col("close") > prev, F.col("close"))
        .when(F.col("close") < prev, -F.col("close"))
        .otherwise(F.lit(0.0))
    )
    return (
        bars.withColumn("signed_val", signed)
        .select(
            "event_id",
            r4(F.sum("signed_val").over(w_series().rowsBetween(Window.unboundedPreceding, 0))).alias(
                "obv"
            ),
        )
    )


# --- W6: windowed extrema (52-week high/low + 20-bar swing levels) ------------
@query(
    "window_extrema",
    oracle=f"""
    WITH bars AS ({_BARS_SQL})
    SELECT event_id,
           ROUND(MAX(high) OVER (PARTITION BY user_id), 4) AS high_52w,
           ROUND(MIN(low) OVER (PARTITION BY user_id), 4) AS low_52w,
           ROUND(MAX(high) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4) AS swing_high,
           ROUND(MIN(low) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4) AS swing_low
    FROM bars
    """,
    tags=("W6",),
)
def window_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir)
    full = Window.partitionBy("user_id")
    swing = w_series().rowsBetween(-19, 0)
    return bars.select(
        "event_id",
        r4(F.max("high").over(full)).alias("high_52w"),
        r4(F.min("low").over(full)).alias("low_52w"),
        r4(F.max("high").over(swing)).alias("swing_high"),
        r4(F.min("low").over(swing)).alias("swing_low"),
    )


# --- W7: max losing streak (gaps-and-islands) ---------------------------------
@query(
    "max_losing_streak",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ret
        FROM events
    ),
    g AS (
        SELECT user_id, ret,
               SUM(CASE WHEN ret < 0 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM s
    ),
    islands AS (
        SELECT user_id, grp, COUNT(*) AS streak
        FROM g WHERE ret < 0 GROUP BY user_id, grp
    )
    SELECT u.user_id, CAST(COALESCE(MAX(i.streak), 0) AS BIGINT) AS max_losing_streak
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN islands i ON i.user_id = u.user_id
    GROUP BY u.user_id
    """,
    tags=("W7",),
)
def max_losing_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive negative deltas per entity, relationally:
    island id = running count of non-negative rows; island size = streak.
    (run_sweep max-losing-streak, without a sequential scan.)"""
    ev = t(spark, sf_dir, "events")
    ret = F.col("value") - F.lag("value").over(w_series())
    grp = F.sum(F.when(F.col("ret") < 0, 0).otherwise(1)).over(
        w_series().rowsBetween(Window.unboundedPreceding, 0)
    )
    with_grp = ev.withColumn("ret", ret).withColumn("grp", grp)
    islands = (
        with_grp.filter(F.col("ret") < 0)
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("streak"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(islands, "user_id", "left")
        .groupBy("user_id")
        .agg(F.coalesce(F.max("streak"), F.lit(0)).cast("long").alias("max_losing_streak"))
    )


# --- W8: explicit lead rows (t+1..t+3 closes + pct) ---------------------------
@query(
    "lead_returns",
    oracle="""
    SELECT event_id,
           ROUND(LEAD(value, 1) OVER w, 2) AS next1,
           ROUND(LEAD(value, 2) OVER w, 2) AS next2,
           ROUND(LEAD(value, 3) OVER w, 2) AS next3,
           ROUND((LEAD(value, 1) OVER w - value) / NULLIF(value, 0) * 100, 4) AS next1_pct
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("W8",),
)
def lead_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    n1 = F.lead("value", 1).over(w_series())
    return ev.select(
        "event_id",
        r2(n1).alias("next1"),
        r2(F.lead("value", 2).over(w_series())).alias("next2"),
        r2(F.lead("value", 3).over(w_series())).alias("next3"),
        r4((n1 - F.col("value")) / F.nullif(F.col("value"), F.lit(0)) * 100).alias("next1_pct"),
    )


# --- W10: chronological holdout split -----------------------------------------
@query(
    "chrono_split",
    oracle="""
    WITH halves AS (
        SELECT o_totalprice,
               NTILE(2) OVER (ORDER BY o_orderdate, o_orderkey) AS half
        FROM orders
    )
    SELECT half, COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 2) AS avg_price,
           ROUND(AVG(CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END), 4) AS win_rate
    FROM halves GROUP BY half
    """,
    tags=("W10",),
)
def chrono_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample/out-of-sample 2-fold split by time, with EXACT
    ``NTILE(2) OVER (ORDER BY o_orderdate, o_orderkey)`` semantics but no
    single-task global sort. The first tile is the first ceil(N/2) rows
    of the (date, key) total order; the split point is located
    distributively: per-date counts roll up to the CALENDAR-bounded date
    frame (cumulative window over ~2.4k rows regardless of data size),
    the cutoff date is the first whose cumulative count reaches
    ceil(N/2), and the cutoff key inside that one date comes from the
    range-bucketed distributed rank (``operators.ranks.with_avg_rank`` —
    orderkeys are unique, so ranks are positions). The split itself is
    then a pure comparison against two broadcast-literal scalars. The
    single-window ntile form survives as a differential twin in
    tests/test_ranks.py."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderkey", "o_totalprice"
    )
    n_total = o.count()
    k = (n_total + 1) // 2
    date_counts = o.groupBy("o_orderdate").agg(F.count(F.lit(1)).alias("cnt"))
    # Bounded frame: one row per calendar date.
    cum = date_counts.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("o_orderdate"))
    )
    cut = (
        cum.where(F.col("cum") >= k).orderBy("o_orderdate").limit(1).collect()
    )
    if cut:
        cutoff_date = cut[0]["o_orderdate"]
        r = k - (cut[0]["cum"] - cut[0]["cnt"])  # >= 1 by construction
        within = o.where(F.col("o_orderdate") == F.lit(cutoff_date)).select(
            "o_orderkey"
        )
        # The pos == r locator REQUIRES unique keys within the cutoff date
        # (ties produce fractional avg ranks and the unpack would raise a
        # bare ValueError). o_orderkey is the table's primary key, so this
        # is a data-contract assertion — checked explicitly on the one
        # date's rows so a violated contract fails with a diagnosis, not a
        # confusing unpack error (ADVICE r5).
        [uniq] = within.agg(
            (F.count(F.lit(1)) == F.count_distinct("o_orderkey")).alias("u")
        ).collect()
        if not uniq["u"]:
            raise ValueError(
                "chrono_split: o_orderkey is not unique within the cutoff "
                f"date {cutoff_date} — the NTILE tie order would be "
                "arbitrary; deduplicate the key or split on a unique key"
            )
        [cr] = (
            with_avg_rank(within, "o_orderkey", "pos")
            .where(F.col("pos") == F.lit(float(r)))
            .collect()
        )
        half = F.when(
            (F.col("o_orderdate") < F.lit(cutoff_date))
            | (
                (F.col("o_orderdate") == F.lit(cutoff_date))
                & (F.col("o_orderkey") <= F.lit(cr["o_orderkey"]))
            ),
            F.lit(1),
        ).otherwise(F.lit(2))
    else:  # empty input: no rows reach the aggregate either way
        half = F.lit(1)
    return (
        o.withColumn("half", half.cast("long"))
        .groupBy("half")
        .agg(
            F.count("*").alias("n"),
            r2(F.avg("o_totalprice")).alias("avg_price"),
            r4(F.avg(F.when(F.col("o_totalprice") > 150000, 1.0).otherwise(0.0))).alias(
                "win_rate"
            ),
        )
    )


# --- W12: dedup-rank (top-1 per key, rest flagged duplicates) -----------------
@query(
    "dedup_rank",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(rn AS INT) AS rn,
           (rn > 1) AS is_duplicate
    FROM (
        SELECT o_orderkey, o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    """,
    tags=("W12", "U3"),
)
def dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forward-paper-trader dedup: deterministic rank per key, first row
    survives, the rest are flagged (docs/TESTING.md one-per-key invariant)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("int").alias("rn"),
    ).withColumn("is_duplicate", F.col("rn") > 1)


# --- sequential funnel: signup → click → purchase ------------------------------
@query(
    "funnel_stages",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_signup
        FROM events
    ),
    s2 AS (
        SELECT user_id, ts, event_type, t_signup,
               MIN(CASE WHEN event_type = 'click' AND ts > t_signup THEN ts END)
                   OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ),
    s3 AS (
        SELECT DISTINCT user_id, t_signup, t_click,
               MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                   OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    )
    SELECT CASE WHEN t_purchase IS NOT NULL THEN 3
                WHEN t_click IS NOT NULL THEN 2
                WHEN t_signup IS NOT NULL THEN 1
                ELSE 0 END AS stage,
           COUNT(*) AS n_users,
           ROUND(AVG(date_diff('second', t_signup, t_click)) / 3600.0, 2) AS avg_hours_to_click,
           ROUND(AVG(date_diff('second', t_click, t_purchase)) / 3600.0, 2) AS avg_hours_to_purchase
    FROM s3
    GROUP BY 1
    """,
    tags=("W-funnel", "streaming"),
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (signup → later click → later purchase):
    chained per-entity window minima — each stage's anchor conditions the
    next stage's conditional MIN, all in one shuffle on user_id. The
    event-analytics counterpart of the reference's stage-gated pipeline
    (scan → enrich → trade each conditions the next day's stage)."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_signup", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
            )
        ).over(w),
    ).select("user_id", "t_signup", "t_click", "t_purchase").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_signup").isNotNull(), 1)
        .otherwise(0)
    )
    secs = lambda a, b: F.col(b).cast("long") - F.col(a).cast("long")
    return s3.groupBy(stage.alias("stage")).agg(
        F.count("*").alias("n_users"),
        r2(F.avg(secs("t_signup", "t_click")) / 3600.0).alias("avg_hours_to_click"),
        r2(F.avg(secs("t_click", "t_purchase")) / 3600.0).alias("avg_hours_to_purchase"),
    )


# --- W-range: TIME-based window frame (RANGE, not ROWS) -----------------------
@query(
    "range_window_revenue",
    oracle="""
    WITH daily AS (
        SELECT l_suppkey, l_shipdate AS day,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e4 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rfix
        FROM lineitem GROUP BY l_suppkey, l_shipdate
    )
    SELECT l_suppkey, day,
           ROUND(rfix / 1e4, 2) AS day_rev,
           ROUND(SUM(rfix) OVER (
               PARTITION BY l_suppkey
               ORDER BY date_diff('day', DATE '1970-01-01', CAST(day AS DATE))
               RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) / 1e4, 2) AS rev_3d,
           CAST(COUNT(*) OVER (
               PARTITION BY l_suppkey
               ORDER BY date_diff('day', DATE '1970-01-01', CAST(day AS DATE))
               RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_days_3d
    FROM daily
    """,
    tags=("W-range", "timeseries"),
)
def range_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-DAY revenue per supplier via a RANGE frame over event
    TIME — the frame a ROWS window cannot express when the calendar has
    gaps (a ROWS-3 frame would silently reach back across quiet weeks).

    Scale shape: pre-aggregate to (supplier, day) first so the window
    sorts |active days| rows per supplier, not raw lineitems; the RANGE
    frame keys on integer epoch DAYS (tz-free, identical in both
    engines). One shuffle (groupBy), one partition-local sort.
    """
    li = t(spark, sf_dir, "lineitem")
    # per-row revenue fixes to integral 1e-4 units BEFORE the group sum:
    # the float sum's accumulation order differs across engines and flips
    # the 2dp rounding by a cent once groups are big enough (bit at sf0.1
    # only — the full-registry sf0.1 sweep caught it; same rule as q9).
    rfix_row = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1e4) + F.lit(0.5)
    ).cast("long")
    daily = li.groupBy("l_suppkey", F.col("l_shipdate").alias("day")).agg(
        F.sum(rfix_row).cast("long").alias("rfix")
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-3, 0)
    )
    return daily.select(
        "l_suppkey",
        "day",
        r2(F.col("rfix") / F.lit(1e4)).alias("day_rev"),
        r2(F.sum("rfix").over(w) / F.lit(1e4)).alias("rev_3d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days_3d"),
    )


# --- time-BOUNDED funnel: stages must complete within 1 h of the entry event --
@query(
    "bounded_window_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ),
    s2 AS (
        SELECT user_id, ts, event_type, t1,
               MIN(CASE WHEN event_type = 'click' AND ts >= t1
                         AND ts <= t1 + INTERVAL 1 HOUR THEN ts END)
                   OVER (PARTITION BY user_id) AS t2
        FROM s1
    ),
    s3 AS (
        SELECT DISTINCT user_id, t1, t2,
               MIN(CASE WHEN event_type = 'purchase' AND ts >= t2
                         AND ts <= t1 + INTERVAL 1 HOUR THEN ts END)
                   OVER (PARTITION BY user_id) AS t3
        FROM s2
    ),
    agg AS (
        SELECT CAST(COUNT(t1) AS BIGINT) AS n1,
               CAST(COUNT(t2) AS BIGINT) AS n2,
               CAST(COUNT(t3) AS BIGINT) AS n3
        FROM s3
    )
    SELECT '1_view' AS stage, n1 AS n_users,
           ROUND(n1 * 1.0E0 / NULLIF(n1, 0), 4) AS pct_of_entry FROM agg
    UNION ALL
    SELECT '2_click', n2, ROUND(n2 * 1.0E0 / NULLIF(n1, 0), 4) FROM agg
    UNION ALL
    SELECT '3_purchase', n3, ROUND(n3 * 1.0E0 / NULLIF(n1, 0), 4) FROM agg
    """,
    tags=("W-funnel", "windowFunnel", "time-bounded"),
)
def bounded_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-windowFunnel semantics: view → later click → later
    purchase, where EVERY later stage must land within 1 hour of the
    ENTRY event (funnel_stages is the unbounded cousin). Chained
    conditional window minima over ONE user_id shuffle — each stage's
    anchor conditions the next stage's window, and the time bound rides
    the same pass; no joins, no extra shuffles. Timestamps compare as
    exact INTERVAL arithmetic on both engines (micros-safe — the
    epoch-flooring trap in NOTES.md does not apply because neither side
    truncates).
    """
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    bound = F.expr("t1 + INTERVAL 1 HOUR")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t1"))
                & (F.col("ts") <= bound),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = (
        s2.withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t2"))
                    & (F.col("ts") <= bound),
                    F.col("ts"),
                )
            ).over(w),
        )
        .select("user_id", "t1", "t2", "t3")
        .distinct()
    )
    agg = s3.agg(
        F.count("t1").cast("long").alias("n1"),
        F.count("t2").cast("long").alias("n2"),
        F.count("t3").cast("long").alias("n3"),
    )
    stages = agg.select(
        F.explode(
            F.array(
                F.struct(F.lit("1_view").alias("stage"), F.col("n1").alias("n_users")),
                F.struct(F.lit("2_click").alias("stage"), F.col("n2").alias("n_users")),
                F.struct(
                    F.lit("3_purchase").alias("stage"), F.col("n3").alias("n_users")
                ),
            )
        ).alias("s"),
        "n1",
    )
    return stages.select(
        F.col("s.stage").alias("stage"),
        F.col("s.n_users").alias("n_users"),
        r4(F.col("s.n_users") / F.nullif(F.col("n1"), F.lit(0))).alias("pct_of_entry"),
    )
