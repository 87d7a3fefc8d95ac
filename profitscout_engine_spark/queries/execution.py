"""Execution-simulation queries: as-of joins, bracket exit, scenario
explode, trading-calendar offsets (SURVEY §2.3 J5/J6/J9, §2.5 W13, §2.10
UDTF-shape).

Fixture mapping (FIXTURES.md B4): events = per-entity bar series
(user_id = contract, ts = bar time, value+10 = price level so brackets sit
away from zero); 'signup' events are the trade anchors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import r2, r4
from ..operators.execution import asof_join, bracket_exit, trading_calendar
from . import query
from ._util import t


def _trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic trade anchors derived from signup events."""
    px = F.col("value") + 10
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("trade_id"),
            F.col("user_id").alias("trade_user"),
            F.col("ts").alias("entry_ts"),
            px.alias("entry_price"),
            (px * 1.05).alias("target_price"),
            (px * 0.95).alias("stop_price"),
            (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("timeout_ts"),
        )
    )


_TRADES_SQL = """
    SELECT event_id AS trade_id, user_id AS trade_user, ts AS entry_ts,
           value + 10 AS entry_price,
           (value + 10) * 1.05 AS target_price,
           (value + 10) * 0.95 AS stop_price,
           ts + INTERVAL 2 DAY AS timeout_ts
    FROM events WHERE event_type = 'signup'
"""


def _price_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = F.col("value") + 10
    return t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.col("event_id").alias("bar_id"),
        (px * 1.02).alias("high"),
        (px * 0.98).alias("low"),
        px.alias("close"),
    )


_PRICE_BARS_SQL = """
    SELECT user_id, ts, event_id AS bar_id,
           (value + 10) * 1.02 AS high,
           (value + 10) * 0.98 AS low,
           value + 10 AS close
    FROM events
"""


# --- J6: as-of join, last prior observation (VIX-as-of) -----------------------
@query(
    "asof_last_prior",
    oracle="""
    SELECT a.event_id AS trade_id,
           ROUND((SELECT b.value FROM events b
                  WHERE b.user_id = a.user_id AND b.event_type = 'error'
                    AND b.ts <= a.ts
                  ORDER BY b.ts DESC, b.event_id DESC LIMIT 1), 2) AS asof_value
    FROM events a
    WHERE a.event_type = 'purchase'
    """,
    tags=("J5", "J6"),
)
def asof_last_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the latest error reading at-or-before it (per
    entity) — union+window as-of, one shuffle, no range explosion."""
    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("trade_id"), F.col("user_id").alias("k"), F.col("ts").alias("lts")
    )
    right = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("k"), F.col("ts").alias("rts"), "event_id", "value"
    )
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        value_cols=["value"], right_tiebreak="event_id", direction="backward",
    )
    return out.select("trade_id", r2(F.col("asof_value")).alias("asof_value"))


# --- J5: as-of join forward (entry bar: exact-or-next) ------------------------
@query(
    "asof_entry_bar",
    oracle="""
    SELECT a.event_id AS trade_id,
           ROUND((SELECT b.value FROM events b
                  WHERE b.user_id = a.user_id
                    AND b.ts >= a.ts + INTERVAL 1 HOUR
                  ORDER BY b.ts ASC, b.event_id ASC LIMIT 1), 2) AS entry_value
    FROM events a
    WHERE a.event_type = 'signup'
    """,
    tags=("J5",),
)
def asof_entry_bar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-bar resolution: the bar at exactly T, else the first after T
    (reference takes the 15:00 bar or the first one following)."""
    ev = t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("trade_id"),
        F.col("user_id").alias("k"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("lts"),
    )
    right = ev.select(
        F.col("user_id").alias("k"), F.col("ts").alias("rts"), "event_id", "value"
    )
    out = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        value_cols=["value"], right_tiebreak="event_id", direction="forward",
    )
    return out.select("trade_id", r2(F.col("asof_value")).alias("entry_value"))


# --- W13: bracket exit --------------------------------------------------------
@query(
    "bracket_exit_scan",
    oracle=f"""
    WITH trades AS ({_TRADES_SQL}),
    bars AS ({_PRICE_BARS_SQL}),
    agg AS (
        SELECT t.trade_id,
               MIN(CASE WHEN b.low <= t.stop_price THEN b.ts END) AS stop_ts,
               MIN(CASE WHEN b.high >= t.target_price THEN b.ts END) AS target_ts,
               max_by(b.close, b.ts) AS last_close,
               COUNT(b.ts) AS n_bars
        FROM trades t
        LEFT JOIN bars b
          ON b.user_id = t.trade_user
         AND b.ts > t.entry_ts AND b.ts <= t.timeout_ts
        GROUP BY t.trade_id
    )
    SELECT t.trade_id, t.trade_user,
           ROUND(t.entry_price, 2) AS entry_price,
           CAST(a.n_bars AS BIGINT) AS n_bars,
           CASE WHEN a.stop_ts IS NOT NULL
                     AND (a.target_ts IS NULL OR a.stop_ts <= a.target_ts)
                THEN 'stop'
                WHEN a.target_ts IS NOT NULL THEN 'target'
                ELSE 'timeout' END AS exit_reason,
           CASE WHEN a.stop_ts IS NOT NULL
                     AND (a.target_ts IS NULL OR a.stop_ts <= a.target_ts)
                THEN a.stop_ts
                WHEN a.target_ts IS NOT NULL THEN a.target_ts
                ELSE t.timeout_ts END AS exit_ts,
           ROUND(CASE WHEN a.stop_ts IS NOT NULL
                           AND (a.target_ts IS NULL OR a.stop_ts <= a.target_ts)
                      THEN t.stop_price
                      WHEN a.target_ts IS NOT NULL THEN t.target_price
                      ELSE COALESCE(a.last_close, t.entry_price) END, 2) AS exit_price,
           ROUND((CASE WHEN a.stop_ts IS NOT NULL
                            AND (a.target_ts IS NULL OR a.stop_ts <= a.target_ts)
                       THEN t.stop_price
                       WHEN a.target_ts IS NOT NULL THEN t.target_price
                       ELSE COALESCE(a.last_close, t.entry_price) END
                  - t.entry_price) / t.entry_price * 100, 4) AS realized_return_pct
    FROM trades t JOIN agg a ON a.trade_id = t.trade_id
    """,
    tags=("W13", "J7"),
)
def bracket_exit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-dependent bracket exit: stop/target/timeout with the stop-first
    intrabar rule and last-close timeout fallback, fully relational."""
    trades = _trades(spark, sf_dir)
    bars = _price_bars(spark, sf_dir)
    resolved = bracket_exit(
        trades.withColumnRenamed("trade_user", "user_id"),
        bars,
        key="user_id",
    )
    return resolved.select(
        "trade_id",
        F.col("user_id").alias("trade_user"),
        r2(F.col("entry_price")).alias("entry_price"),
        F.col("n_bars").cast("long").alias("n_bars"),
        "exit_reason",
        "exit_ts",
        r2(F.col("exit_price")).alias("exit_price"),
        r4(F.col("realized_return_pct")).alias("realized_return_pct"),
    )


# --- UDTF shape: scenario explode (1 trade → 3 scenario rows) -----------------
@query(
    "scenario_explode",
    oracle=f"""
    WITH trades AS ({_TRADES_SQL})
    SELECT t.trade_id, s.scenario,
           ROUND(t.entry_price * (1 + s.entry_slip), 4) AS filled_entry,
           ROUND(t.target_price * (1 - s.exit_haircut), 4) AS effective_target,
           ROUND((t.target_price * (1 - s.exit_haircut)
                  - t.entry_price * (1 + s.entry_slip))
                 / (t.entry_price * (1 + s.entry_slip)) * 100, 4) AS max_gain_pct
    FROM trades t
    CROSS JOIN (VALUES ('base', 0.02, 0.0),
                       ('stress', 0.05, 0.05),
                       ('morning', 0.03, 0.02))
         AS s(scenario, entry_slip, exit_haircut)
    """,
    tags=("UDTF", "A15"),
)
def scenario_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simulate_live_execution: each signal fans out into literal scenario
    rows — explode over an inline array of structs, no UDTF needed."""
    scenarios = F.array(
        F.struct(F.lit("base").alias("scenario"), F.lit(0.02).alias("entry_slip"), F.lit(0.0).alias("exit_haircut")),
        F.struct(F.lit("stress").alias("scenario"), F.lit(0.05).alias("entry_slip"), F.lit(0.05).alias("exit_haircut")),
        F.struct(F.lit("morning").alias("scenario"), F.lit(0.03).alias("entry_slip"), F.lit(0.02).alias("exit_haircut")),
    )
    tr = _trades(spark, sf_dir).withColumn("s", F.explode(scenarios))
    filled = F.col("entry_price") * (1 + F.col("s.entry_slip"))
    eff_target = F.col("target_price") * (1 - F.col("s.exit_haircut"))
    return tr.select(
        "trade_id",
        F.col("s.scenario").alias("scenario"),
        r4(filled).alias("filled_entry"),
        r4(eff_target).alias("effective_target"),
        r4((eff_target - filled) / filled * 100).alias("max_gain_pct"),
    )


# --- J9: trading-calendar offsets ---------------------------------------------
@query(
    "trading_day_offsets",
    oracle="""
    WITH cal AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS cal_date
        FROM orders WHERE dayofweek(o_orderdate) BETWEEN 1 AND 5
    ),
    idx AS (
        SELECT cal_date, ROW_NUMBER() OVER (ORDER BY cal_date) AS day_index
        FROM cal
    ),
    anchors AS (
        SELECT DISTINCT CAST(o_orderdate AS DATE) AS scan_date
        FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '2001-07-01'
    ),
    entry AS (
        SELECT a.scan_date, MIN(i.day_index) AS entry_index
        FROM anchors a JOIN idx i ON i.cal_date > a.scan_date
        GROUP BY a.scan_date
    )
    SELECT e.scan_date,
           i1.cal_date AS entry_day,
           i3.cal_date AS timeout_day
    FROM entry e
    JOIN idx i1 ON i1.day_index = e.entry_index
    JOIN idx i3 ON i3.day_index = e.entry_index + 2
    """,
    tags=("J9",),
)
def trading_day_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-trading-day + Nth-trading-day arithmetic via an indexed calendar
    dim (broadcast): entry day = first trading day after scan, timeout =
    2 trading days later (3-day hold)."""
    o = t(spark, sf_dir, "orders")
    cal = trading_calendar(o.select(F.col("o_orderdate").cast("date").alias("cal_date")))
    anchors = (
        o.select(F.col("o_orderdate").cast("date").alias("scan_date"))
        .filter(F.col("scan_date") < F.lit("2001-07-01").cast("date"))
        .distinct()
    )
    entry = (
        anchors.join(F.broadcast(cal), cal["cal_date"] > anchors["scan_date"])
        .groupBy("scan_date")
        .agg(F.min("day_index").alias("entry_index"))
    )
    i1 = cal.select(F.col("cal_date").alias("entry_day"), F.col("day_index").alias("i1"))
    i3 = cal.select(F.col("cal_date").alias("timeout_day"), F.col("day_index").alias("i3"))
    return (
        entry.join(F.broadcast(i1), F.col("entry_index") == F.col("i1"))
        .join(F.broadcast(i3), F.col("entry_index") + 2 == F.col("i3"))
        .select("scan_date", "entry_day", "timeout_day")
    )
