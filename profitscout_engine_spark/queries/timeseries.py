"""EWM indicators, Monte Carlo, and event-time window queries
(SURVEY §2.5 W2/W14, §2.9 streaming-window extensions).

- ``ewm_ema``: EMA-21 twice over — Arrow ``applyInPandas`` (pandas
  semantics) on the Spark side, closed-form weighted-sum algebra as the
  DuckDB oracle. The two formulations agreeing IS the W2 correctness check.
- ``rsi_macd`` / ``monte_carlo_paths``: genuinely non-SQL kernels → no
  oracle (driver records rows-only); pinned instead by pytest
  (vs hand-computed pandas; reproducibility run-over-run).
- ``tumbling_window_agg`` / ``session_windows``: native event-time windows
  on the batch path, oracle-checked; the streaming twin runs the same
  aggregation through Structured Streaming (tests assert parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import r2, r4
from ..operators.indicators import ewm_indicator_frame
from . import query
from ._util import t


def _close_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").alias("close")
    )


# --- W2: EMA via applyInPandas, oracled by closed-form window algebra ---------
@query(
    "ewm_ema",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    terms AS (
        SELECT user_id, event_id,
               value * POWER(1.0 - 2.0/22.0, -rn) AS num_term,
               POWER(1.0 - 2.0/22.0, -rn) AS den_term,
               rn
        FROM ordered
    )
    SELECT event_id,
           ROUND(SUM(num_term) OVER w / SUM(den_term) OVER w, 4) AS ema_21
    FROM terms
    WINDOW w AS (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING)
    """,
    tags=("W2",),
)
def ewm_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA-21 (pandas ewm(span=21, adjust=True)) per entity series."""
    bars = _close_bars(spark, sf_dir)
    ind = ewm_indicator_frame(bars, key="user_id", ts="ts", order_id="event_id", close="close")
    return ind.select("event_id", r4(F.col("ema")).alias("ema_21"))


# --- W2 (recursive kernels): RSI + MACD, rows-only contract -------------------
@query("rsi_macd", oracle=None, tags=("W2",))
def rsi_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder RSI-14 + MACD(12,26,9) — recursive EWMs with no closed-form
    SQL twin; correctness pinned by pytest against direct pandas."""
    bars = _close_bars(spark, sf_dir)
    ind = ewm_indicator_frame(bars, key="user_id", ts="ts", order_id="event_id", close="close")
    return ind.select(
        "event_id",
        r4(F.col("rsi")).alias("rsi_14"),
        r4(F.col("macd")).alias("macd"),
        r4(F.col("macd_signal")).alias("macd_signal"),
    )


# --- W14: Monte Carlo (seeded, partition-independent) -------------------------
@query("monte_carlo_paths", oracle=None, tags=("W14",))
def monte_carlo_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1,000 bootstrap lifetimes over the empirical bracket-exit return
    pool. The pool stays a DataFrame end-to-end (no collect — the sim
    grid resolves hash-indexed draws via a broadcast join), and draws are
    xxhash64-derived, so results are identical across runs AND partition
    layouts; reproducibility asserted in pytest."""
    from ..operators.montecarlo import simulate_paths_pooled
    from .execution import bracket_exit_scan

    pool_df = bracket_exit_scan(spark, sf_dir).select("trade_id", "realized_return_pct")
    sims = simulate_paths_pooled(
        pool_df,
        return_col="realized_return_pct",
        order_col="trade_id",
        n_sims=1000,
        trades_per_sim=40,
        seed=42,
    )
    return sims.select(
        "sim_id",
        r2(F.col("final_capital")).alias("final_capital"),
        r4(F.col("max_drawdown")).alias("max_drawdown"),
        "ruined",
    )


# --- streaming-window extension: tumbling event-time window -------------------
@query(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "A1"),
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native tumbling window (batch path; the streaming twin runs the same
    plan through readStream — see streaming/ and its parity test)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), r2(F.sum("value")).alias("total_value"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "total_value")
    )


# --- custom stateful streaming: incremental per-user totals -------------------
@query(
    "stateful_user_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState incremental aggregation driven to completion:
    the final per-key GroupState must equal the batch groupBy — the
    'process each row once' incremental-backfill contract, oracle-checked."""
    from ..streaming.stateful import run_stateful_totals

    out = run_stateful_totals(spark, sf_dir)
    return out.select("user_id", "n_events", r2(F.col("total_value")).alias("total_value"))


# --- streaming-window extension: session windows (30-min gap) -----------------
@query(
    "session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
    tags=("streaming", "session"),
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30 min) per user — sessionization the engine gets
    natively; oracle reconstructs it as gaps-and-islands."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), r2(F.sum("value")).alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
