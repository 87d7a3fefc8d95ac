"""Operator-level tests beyond the oracle: differential implementations,
reference invariants (SURVEY §5 / FIXTURES.md §C), and behavioral edges."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from profitscout_engine_spark.operators.execution import (
    asof_join,
    bracket_exit,
    bracket_exit_pandas,
)
from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries.execution import _price_bars, _trades

REGISTRY = load_registry()


def test_bracket_exit_differential(spark, sf_dir):
    """Relational W13 must agree with the sequential early-exit walk
    (the reference's semantics) on every trade — the SURVEY risk-register
    item 1 mitigation."""
    trades = _trades(spark, sf_dir).withColumnRenamed("trade_user", "user_id")
    bars = _price_bars(spark, sf_dir)
    rel = (
        bracket_exit(trades, bars, key="user_id")
        .select("trade_id", "exit_reason", "exit_ts", "exit_price")
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    seq = (
        bracket_exit_pandas(trades, bars, key="user_id")
        .select("trade_id", "exit_reason", "exit_ts", "exit_price")
        .toPandas()
        .sort_values("trade_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rel, seq, check_dtype=False)


def test_no_lookahead_invariant(spark, sf_dir):
    """audit_winner lookahead-bias check: every exit strictly after entry."""
    trades = _trades(spark, sf_dir).withColumnRenamed("trade_user", "user_id")
    bars = _price_bars(spark, sf_dir)
    resolved = bracket_exit(trades, bars, key="user_id")
    bad = resolved.filter(F.col("exit_ts") <= F.col("entry_ts")).count()
    assert bad == 0


def test_dedup_invariant(spark, sf_dir):
    """docs/TESTING.md: at most one non-duplicate row per key after W12."""
    df = REGISTRY["dedup_rank"].fn(spark, sf_dir)
    dupes = (
        df.filter(~F.col("is_duplicate"))
        .groupBy("o_custkey")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0


def test_tier_exhaustiveness(spark, sf_dir):
    """win-tracker classify ladder covers all reals — no NULL tier."""
    df = REGISTRY["tier_tally"].fn(spark, sf_dir)
    assert df.filter(F.col("tier").isNull()).count() == 0


def test_score_bounds(spark, sf_dir):
    """Boosted score clamped to [0, 10] (overnight_scanner clamp)."""
    df = REGISTRY["scanner_rank"].fn(spark, sf_dir)
    rows = df.select("score", "original_score").collect()
    assert all(0 <= r["score"] <= 10 for r in rows)
    assert all(r["score"] >= r["original_score"] for r in rows)


def test_asof_join_edges(spark):
    """Inclusive-at-equal-ts semantics and null when nothing qualifies."""
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 50), (3, 2, 10)], "lid int, k int, lts long"
    )
    right = spark.createDataFrame(
        [(1, 100, 7, 1.0), (1, 99, 6, 2.0), (2, 11, 8, 3.0)],
        "k int, rts long, event_id int, value double",
    )
    back = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        value_cols=["value"], right_tiebreak="event_id", direction="backward",
    ).toPandas().set_index("lid")["asof_value"]
    assert back[1] == 1.0  # inclusive: right at ts=100 matches left ts=100
    assert pd.isna(back[2])  # nothing at-or-before 50
    assert pd.isna(back[3])  # k=2 first bar is after 10

    fwd = asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        value_cols=["value"], right_tiebreak="event_id", direction="forward",
    ).toPandas().set_index("lid")["asof_value"]
    assert fwd[1] == 1.0  # inclusive at 100
    assert fwd[2] == 2.0  # first at-or-after 50 is ts=99
    assert fwd[3] == 3.0


def test_exit_reason_distribution(spark, sf_dir):
    """The fixture brackets must exercise all three exit paths, or the
    when()-ladder order is untested."""
    df = REGISTRY["bracket_exit_scan"].fn(spark, sf_dir)
    reasons = {r["exit_reason"] for r in df.select("exit_reason").distinct().collect()}
    assert reasons == {"stop", "target", "timeout"}


def test_cli_list_and_unknown(capsys):
    from profitscout_engine_spark.__main__ import main

    assert main(["list", "q1_pricing"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "oracle" in out
    assert main(["run", "no_such_query"]) == 2
