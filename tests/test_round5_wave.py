"""Round-5 additions: semantic invariants beyond the oracle gate.

- sweep_grid_full: grid completeness, per-config accounting identities,
  and a hand-walked single-trade differential against the relational form.
- enrichment_news_rollup: conservation identities over the call boundary.
- shard_manifest: partition-function identities (cover, disjoint, balance).
- curriculum_stage_split: stage budgets partition the corpus exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries.pipelines import (
    SWEEP_BRACKETS,
    SWEEP_HOLDS_D,
    SWEEP_OFFS_H,
)
from profitscout_engine_spark.queries.textops import N_SHARDS

REGISTRY = load_registry()


def test_sweep_grid_completeness_and_identities(spark, sf_dir):
    df = REGISTRY["sweep_grid_full"].fn(spark, sf_dir)
    rows = df.collect()
    n_cfg = len(SWEEP_OFFS_H) * len(SWEEP_BRACKETS) * len(SWEEP_HOLDS_D)
    assert n_cfg == 255
    if not rows:  # md5 sample can be empty at tiny SFs — still a valid grid
        return
    assert len(rows) == n_cfg  # every config present exactly once
    n_trades = {r["n_trades"] for r in rows}
    assert len(n_trades) == 1  # every config resolves every sampled trade
    for r in rows:
        assert r["n_stop"] + r["n_target"] + r["n_timeout"] == r["n_trades"]
        assert 0.0 <= r["win_rate"] <= 1.0
    # monotonicity: with identical stops/holds, a HIGHER target can't have
    # a higher target-hit count (harder bracket hits no more often)
    by_key = {
        (r["off_h"], r["s_bps"], r["hold_d"], r["t_bps"]): r["n_target"]
        for r in rows
    }
    for (off, s, h, t), n_tgt in by_key.items():
        higher = by_key.get((off, s, h, t + 500))
        if higher is not None:
            assert higher <= n_tgt


def test_enrichment_rollup_conservation(spark, sf_dir):
    df = REGISTRY["enrichment_news_rollup"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_ok"] + r["n_no_analysis"] == r["n_signals"]
        # each signal takes >= 1 attempt and <= 3 (MAX_RETRIES)
        assert r["n_signals"] <= r["total_attempts"] <= 3 * r["n_signals"]
        assert 0 <= r["n_with_news"] <= r["n_ok"]
        assert abs(r["sum_sentiment_bp"]) <= 1000 * r["n_ok"]


def test_shard_manifest_partitions_corpus(spark, sf_dir):
    from profitscout_engine_spark.queries._util import t

    df = REGISTRY["shard_manifest"].fn(spark, sf_dir)
    rows = df.collect()
    docs = t(spark, sf_dir, "documents")
    total_docs = docs.count()
    [tot] = docs.agg(F.sum("n_chars").alias("s")).collect()
    assert sum(r["n_docs"] for r in rows) == total_docs  # cover
    assert sum(r["n_chars_total"] for r in rows) == tot["s"]
    assert len(rows) <= N_SHARDS
    assert len({r["shard"] for r in rows}) == len(rows)  # disjoint ids
    if total_docs >= 50 * N_SHARDS:  # balance only meaningful when populated
        sizes = [r["n_docs"] for r in rows]
        assert len(rows) == N_SHARDS
        assert max(sizes) <= 2 * min(sizes)  # md5 uniformity, loose bound


def test_curriculum_stages_partition_corpus(spark, sf_dir):
    from profitscout_engine_spark.queries._util import t

    df = REGISTRY["curriculum_stage_split"].fn(spark, sf_dir)
    rows = df.collect()
    docs = t(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    stages = sorted({r["stage"] for r in rows})
    assert stages[0] == 0 and stages[-1] <= 3
    # stage length ranges are ordered: max of stage k <= min of stage k+2
    # (adjacent stages may share the boundary value itself)
    by_stage = {}
    for r in rows:
        lo, hi = by_stage.get(r["stage"], (r["min_chars"], r["max_chars"]))
        by_stage[r["stage"]] = (min(lo, r["min_chars"]), max(hi, r["max_chars"]))
    for k in stages:
        if k + 1 in by_stage:
            assert by_stage[k][1] <= by_stage[k + 1][1]
            assert by_stage[k][0] <= by_stage[k + 1][0]
