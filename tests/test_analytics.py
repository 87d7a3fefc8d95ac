"""Property tests for the finance / maintenance / analytics additions —
independent brute-force or invariant checks on top of the DuckDB oracle
gate (which already covers exact value equality)."""

from __future__ import annotations

import pandas as pd

from profitscout_engine_spark.queries import load_registry

REGISTRY = load_registry()


def test_pareto_frontier_matches_bruteforce(spark, sf_dir):
    out = REGISTRY["pareto_frontier"].fn(spark, sf_dir).toPandas()
    part = spark.read.parquet(f"{sf_dir}/part.parquet").toPandas()
    keep = []
    for _, x in part.iterrows():
        dominated = (
            (part.p_retailprice <= x.p_retailprice)
            & (part.p_size >= x.p_size)
            & ((part.p_retailprice < x.p_retailprice) | (part.p_size > x.p_size))
        ).any()
        if not dominated:
            keep.append(int(x.p_partkey))
    assert sorted(out.p_partkey) == sorted(keep)
    # frontier is a strict staircase: paying more must buy strictly more size
    f = out.sort_values("p_retailprice")
    assert (f.p_size.diff().dropna() > 0).all() or len(f) == 1


def test_interval_peak_load_matches_bruteforce(spark, sf_dir):
    out = REGISTRY["interval_peak_load"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    for et, grp in ev.groupby("event_type"):
        bounds = pd.concat(
            [
                pd.DataFrame({"bt": grp.ts, "delta": 1}),
                pd.DataFrame({"bt": grp.ts + pd.Timedelta(minutes=30), "delta": -1}),
            ]
        ).sort_values(["bt", "delta"])
        cur = bounds.delta.cumsum()
        peak = int(cur.max())
        row = out[out.event_type == et].iloc[0]
        assert int(row.peak_concurrency) == peak
        assert row.peak_at == bounds.bt[cur == peak].min()


def test_ohlc_candle_invariants(spark, sf_dir):
    out = REGISTRY["ohlc_resample"].fn(spark, sf_dir).toPandas()
    assert (out.low <= out.high).all()
    assert ((out.open >= out.low) & (out.open <= out.high)).all()
    assert ((out.close >= out.low) & (out.close <= out.high)).all()
    assert ((out.vwap >= out.low - 1e-9) & (out.vwap <= out.high + 1e-9)).all()
    assert (out.volume >= out.n_trades).all()  # vol proxy >= 1 per trade
    # candle count conserves events
    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.n_trades.sum() == ev_n


def test_scd2_intervals_partition_history(spark, sf_dir):
    out = REGISTRY["scd2_history"].fn(spark, sf_dir).toPandas()
    for uid, h in out.groupby("user_id"):
        h = h.sort_values("version_n")
        # versions are 1..n contiguous
        assert list(h.version_n) == list(range(1, len(h) + 1))
        # half-open intervals chain exactly: valid_to[i] == valid_from[i+1]
        assert (
            h.valid_to.iloc[:-1].reset_index(drop=True)
            == h.valid_from.iloc[1:].reset_index(drop=True)
        ).all()
        # exactly one current row, closed at the sentinel
        assert (h.is_current.sum()) == 1
        assert h[h.is_current].valid_to.iloc[0] == pd.Timestamp("2200-01-01")
        # adjacent versions change the attribute
        adj = h.event_type.iloc[:-1].reset_index(drop=True) != h.event_type.iloc[
            1:
        ].reset_index(drop=True)
        assert adj.all()


def test_containment_dominates_jaccard(spark, sf_dir):
    """max(containment) >= jaccard for every candidate pair: the union is
    at least as large as either side, so containment can only exceed the
    Jaccard score — the reason it catches subset-dups Jaccard misses."""
    cont = REGISTRY["containment_pairs"].fn(spark, sf_dir).toPandas()
    assert ((cont.cont_1 <= 1.0) & (cont.cont_2 <= 1.0)).all()
    assert ((cont.cont_1 > 0) & (cont.cont_2 > 0)).all()
    jac = REGISTRY["ngram_jaccard_pairs"].fn(spark, sf_dir).toPandas()
    j = cont.merge(jac, on=["d1", "d2"], how="inner")
    if len(j):
        assert (
            j[["cont_1", "cont_2"]].max(axis=1) >= j.jaccard - 1e-9
        ).all()


def test_incremental_merge_equals_recompute_on_any_cutoff(spark, sf_dir):
    """The partial-merge identity must hold for EVERY cutoff, not just the
    registered one — merge(count/sum partials) is cutoff-invariant."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    full = (
        orders.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("s"))
        .toPandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    for cutoff in ["1995-06-01", "2001-01-01"]:
        c = F.to_timestamp(F.lit(cutoff))
        base = orders.where(F.col("o_orderdate") < c)
        delta = orders.where(F.col("o_orderdate") >= c)
        part = lambda df: df.groupBy("o_orderpriority").agg(  # noqa: E731
            F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
        )
        merged = (
            part(base)
            .unionAll(part(delta))
            .groupBy("o_orderpriority")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            .toPandas()
            .set_index("o_orderpriority")
            .sort_index()
        )
        assert (merged.n == full.n).all()
        assert (abs(merged.s - full.s) < 1e-6 * abs(full.s)).all()


def test_retention_cohort_invariants(spark, sf_dir):
    out = REGISTRY["retention_cohorts"].fn(spark, sf_dir).toPandas()
    # week 0 is full retention by construction (first week is active)
    w0 = out[out.week_offset == 0]
    assert (w0.n_active == w0.cohort_size).all()
    assert (w0.retention == 1.0).all()
    assert (out.n_active <= out.cohort_size).all()
    assert (out.week_offset >= 0).all()
    # cohort sizes sum to the distinct-user universe
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id").distinct().count()
    )
    assert w0.cohort_size.sum() == n_users


def test_key_skew_report_invariants(spark, sf_dir):
    out = REGISTRY["key_skew_report"].fn(spark, sf_dir).toPandas().sort_values("rank")
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (out.cnt.diff().dropna() <= 0).all()  # non-increasing head
    assert (out.cum_share_pct.diff().dropna() > 0).all()
    assert out.cum_share_pct.iloc[-1] <= 100.0 + 1e-9
    assert (out.skew_ratio > 0).all()


def test_pagerank_iteration_is_a_distribution_step(spark, sf_dir):
    out = REGISTRY["pagerank_iteration"].fn(spark, sf_dir).toPandas()
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n
    # teleport floor for every node, isolated nodes sit exactly on it
    assert (out.pr_next >= 0.15 / n - 1e-12).all()
    # no dangling-mass redistribution in this variant: total mass <= 1
    assert out.pr_next.sum() <= 1.0 + 1e-9
    # symmetric-graph property: mass conserved over non-isolated nodes
    # (every edge's contribution lands on some node), so sum > teleport mass
    assert out.pr_next.sum() > 0.15 - 1e-9


def test_gap_fill_spine_is_dense_and_filled(spark, sf_dir):
    out = REGISTRY["gap_fill_ffill"].fn(spark, sf_dir).toPandas()
    assert out.close_filled.notna().all()  # spine starts at first observation
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("h")
        # dense hourly spine: every consecutive step is exactly one hour
        assert (g.h.diff().dropna() == pd.Timedelta(hours=1)).all()
        # first row is a real observation, not a fill
        assert not bool(g.is_gap.iloc[0])
    # filled rows carry the previous observation forward: spot-check one user
    uid = out.user_id.iloc[0]
    g = out[out.user_id == uid].sort_values("h").reset_index(drop=True)
    for i in range(1, len(g)):
        if g.is_gap[i]:
            assert g.close_filled[i] == g.close_filled[i - 1]


def test_quantile_digest_error_envelope(spark, sf_dir):
    """The merged block-digest estimate must sit close to the true
    quantile: each block's type-1 order statistic is a consistent
    estimator, and the weighted mean over 64 md5 blocks concentrates.
    Pin a 5% relative envelope (observed <1% on the fixtures)."""
    import numpy as np

    out = (
        REGISTRY["quantile_digest_merge"].fn(spark, sf_dir).toPandas().set_index("quantile")
    )
    x = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_extendedprice")
        .toPandas()["l_extendedprice"]
        .to_numpy()
    )
    for lab, q in [("q25", 0.25), ("q50", 0.5), ("q75", 0.75)]:
        exact = np.quantile(x, q)
        est = out.loc[lab, "est"]
        assert abs(est - exact) / exact < 0.05, (lab, est, exact)
        assert out.loc[lab, "n_total"] == len(x)
