"""Pins for the non-SQL kernels (W2 recursive EWMs, W14 Monte Carlo) and
batch↔stream parity for the event-time window aggregations."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from profitscout_engine_spark.catalog import table
from profitscout_engine_spark.operators.montecarlo import simulate_paths, simulate_paths_tiered
from profitscout_engine_spark.queries import load_registry

REGISTRY = load_registry()


def test_rsi_macd_matches_pandas(spark, sf_dir):
    """The applyInPandas indicator block must equal a direct pandas
    computation on the same series (pandas semantics are the contract)."""
    got = (
        REGISTRY["rsi_macd"].fn(spark, sf_dir).toPandas().set_index("event_id").sort_index()
    )
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value").toPandas()
    expected = {}
    for _, grp in ev.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        c = g["value"]
        delta = c.diff()
        avg_gain = delta.clip(lower=0.0).ewm(alpha=1 / 14, adjust=False).mean()
        avg_loss = (-delta).clip(lower=0.0).ewm(alpha=1 / 14, adjust=False).mean()
        rsi = 100 - 100 / (1 + avg_gain / avg_loss)
        rsi = rsi.where(avg_loss > 0, 100.0).where(~delta.isna(), None)
        macd = c.ewm(span=12, adjust=False).mean() - c.ewm(span=26, adjust=False).mean()
        sig = macd.ewm(span=9, adjust=False).mean()
        for eid, r, m, s in zip(g["event_id"], rsi, macd, sig):
            expected[eid] = (r, m, s)
    exp = pd.DataFrame.from_dict(
        expected, orient="index", columns=["rsi_14", "macd", "macd_signal"]
    ).sort_index()
    for col in ["rsi_14", "macd", "macd_signal"]:
        pd.testing.assert_series_equal(
            got[col],
            exp[col].astype(float).round(4),
            check_names=False,
            check_index=False,
            atol=1e-9,
            rtol=0,
        )


def test_monte_carlo_reproducible(spark):
    """Seeded hash-based draws: identical results run-over-run AND across
    different partitionings (the np.random.seed(42) invariant, but
    partition-safe)."""
    pool = [40.0, -25.0, 12.5, -8.0, 3.0]
    a = simulate_paths(spark, pool, n_sims=200, trades_per_sim=30, seed=42).toPandas()
    b = simulate_paths(spark, pool, n_sims=200, trades_per_sim=30, seed=42).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("sim_id").reset_index(drop=True),
        b.sort_values("sim_id").reset_index(drop=True),
    )
    c = (
        simulate_paths(spark, pool, n_sims=200, trades_per_sim=30, seed=7)
        .toPandas()
        .sort_values("sim_id")
    )
    assert not a.sort_values("sim_id")["final_capital"].equals(c["final_capital"])


def test_monte_carlo_tiered_reproducible(spark):
    pool = [40.0, -25.0, 12.5]
    a = simulate_paths_tiered(spark, pool, n_sims=50, trades_per_sim=20, seed=42).toPandas()
    b = simulate_paths_tiered(spark, pool, n_sims=50, trades_per_sim=20, seed=42).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("sim_id").reset_index(drop=True),
        b.sort_values("sim_id").reset_index(drop=True),
    )
    assert a["final_capital"].std() > 0  # paths actually diverge


@pytest.mark.slow
def test_stream_batch_parity(spark, sf_dir):
    """The tumbling aggregation produces identical results through the
    batch planner and through Structured Streaming (AvailableNow) — the
    idempotent-daily-batch ≙ incremental-stream equivalence."""
    from profitscout_engine_spark.streaming import run_stream_aggregation

    streamed = (
        run_stream_aggregation(spark, sf_dir)
        .withColumn("total_value", F.round("total_value", 6))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        REGISTRY["tumbling_window_agg"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch)
    assert (streamed["n"].values == batch["n"].values).all()
    assert (streamed["window_start"].values == batch["window_start"].values).all()


def test_monte_carlo_pooled_partition_independent(spark, sf_dir):
    """The distributed-pool variant must produce identical sims no matter
    how the pool arrives partitioned (hash draws + deterministic index)."""
    from profitscout_engine_spark.operators.montecarlo import simulate_paths_pooled
    from profitscout_engine_spark.queries.execution import bracket_exit_scan

    pool = bracket_exit_scan(spark, sf_dir).select("trade_id", "realized_return_pct")
    a = simulate_paths_pooled(pool, "realized_return_pct", "trade_id", 100, 20).toPandas()
    b = simulate_paths_pooled(
        pool.repartition(7), "realized_return_pct", "trade_id", 100, 20
    ).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("sim_id").reset_index(drop=True),
        b.sort_values("sim_id").reset_index(drop=True),
    )
    assert a["final_capital"].std() > 0


def test_ema_weighted_sum_50k_rows_matches_pandas(spark):
    """The segment-rescaled closed form must hold at depths where the naive
    d^(-rn) factorization overflowed (~10k rows at span 21): 50k rows per
    entity, machine-precision agreement with pandas ewm(span, adjust=True)."""
    import numpy as np
    import pandas as pd

    from profitscout_engine_spark.operators.indicators import ema_weighted_sum

    rng = np.random.default_rng(7)
    n = 50_000
    pdf = pd.DataFrame(
        {
            "user_id": np.repeat([1, 2], n),
            "ts": np.tile(np.arange(n), 2),
            "event_id": np.arange(2 * n),
            "close": rng.normal(100, 15, 2 * n),
        }
    )
    got = (
        ema_weighted_sum(spark.createDataFrame(pdf), key="user_id", ts="ts",
                         order_id="event_id", close="close")
        .toPandas().sort_values(["user_id", "ts"]).reset_index(drop=True)
    )
    exp = (
        pdf.groupby("user_id", group_keys=False)
        .apply(lambda g: g.assign(ema=g["close"].ewm(span=21, adjust=True).mean()))
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    )
    assert np.isfinite(got["ema"].to_numpy()).all()
    np.testing.assert_allclose(got["ema"].to_numpy(), exp["ema"].to_numpy(), rtol=1e-9)


def test_sliding_stream_batch_parity(spark, sf_dir):
    """The 1h/30m hopping aggregation produces identical window membership
    through the batch planner and through Structured Streaming
    (AvailableNow) — each event must land in exactly width/slide = 2
    windows on both paths."""
    from profitscout_engine_spark.streaming import run_stream_aggregation

    def sliding(events):
        return (
            events.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"))
            .select(
                F.col("w.start").alias("window_start"), "event_type", "n"
            )
        )

    streamed = (
        run_stream_aggregation(spark, sf_dir, agg_builder=sliding)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        REGISTRY["sliding_window_rate"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch)
    assert (streamed["n"].values == batch["n"].values).all()
    assert (streamed["window_start"].values == batch["window_start"].values).all()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert int(batch["n"].sum()) == 2 * n_events
