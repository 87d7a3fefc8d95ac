"""Round-6 wave invariants: the distributed prefix-sum operator and its
consumers (systematic resampling), the UniMax budget allocator, and the
split-conformal calibration audit."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from profitscout_engine_spark.operators.scan import with_prefix_sum
from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries._util import t

REGISTRY = load_registry()


def test_prefix_sum_matches_global_window(spark, sf_dir):
    """with_prefix_sum == SUM(v) OVER (ORDER BY key) through one global
    window, on a UNIQUE key (the systematic_resample shape)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = (
        with_prefix_sum(d, "doc_id", "n_chars", "c")
        .select("doc_id", "c")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        d.select(
            "doc_id",
            F.sum("n_chars")
            .over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("c"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert str(got["c"].dtype) == "int64"  # integer weights stay exact BIGINT


def test_prefix_sum_tie_keys_follow_range_semantics(spark, sf_dir):
    """Tied keys share the through-the-last-peer total, exactly like the
    SQL default RANGE frame — o_orderdate has heavy ties."""
    o = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .where(F.col("o_orderkey") % 7 == 0)
    )
    got = (
        with_prefix_sum(o, "o_orderdate", "o_totalprice", "c")
        .select("o_orderkey", "c")
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = (
        o.select(
            "o_orderkey",
            F.sum("o_totalprice").over(Window.orderBy("o_orderdate")).alias("c"),
        )
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    # float column: totals must agree to float noise; ties grouped identically
    assert (got["c"] - want["c"]).abs().max() < 1e-6 * want["c"].abs().max()


def test_systematic_resample_draw_count_is_exact(spark, sf_dir):
    """The probe-count function telescopes: total draws == |docs| div 4,
    every emitted doc has >= 1 draw, and no doc exceeds its interval's
    ceiling probe capacity."""
    out = REGISTRY["systematic_resample"].fn(spark, sf_dir).toPandas()
    d = t(spark, sf_dir, "documents")
    n_docs = d.count()
    w_total = d.agg(F.sum("n_chars")).collect()[0][0]
    n_target = n_docs // 4
    assert out["n_samples"].sum() == n_target
    assert (out["n_samples"] >= 1).all()
    # a doc of weight w can catch at most floor(w*N/W) + 1 probes
    cap = (out["weight"] * n_target) // w_total + 1
    assert (out["n_samples"] <= cap).all()


def test_token_budget_epochs_waterfill_invariants(spark, sf_dir):
    """Allocations sum to the budget, capped sources sit exactly at their
    cap, uncapped sources share one water level, and nobody exceeds
    EPOCH_CAP epochs."""
    from profitscout_engine_spark.queries.curation import BUDGET_TENTHS, EPOCH_CAP

    out = REGISTRY["token_budget_epochs"].fn(spark, sf_dir).toPandas()
    budget = int(out["tokens"].sum()) * BUDGET_TENTHS // 10
    assert abs(out["alloc_tokens"].sum() - budget) < 1e-2  # 4dp rounding slack
    capped = out[out["capped"]]
    uncapped = out[~out["capped"]]
    assert (capped["alloc_tokens"] == capped["cap_tokens"]).all()
    if len(uncapped) > 1:
        assert uncapped["alloc_tokens"].nunique() == 1  # one water level
    if len(capped) and len(uncapped):
        assert capped["cap_tokens"].max() <= uncapped["alloc_tokens"].min() + 1e-9
    assert (out["epochs"] <= EPOCH_CAP + 1e-9).all()


def test_conformal_calibration_order_statistic(spark, sf_dir):
    """q-hat really is the k-th smallest calibration score: at least k
    calibration scores sit at or under it, fewer than k under it."""
    out = REGISTRY["conformal_calibration"].fn(spark, sf_dir).toPandas()
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars").toPandas()
    cal = d[d["doc_id"] % 2 == 0]
    for _, r in out.iterrows():
        g = cal[cal["lang"] == r["lang"]]["n_chars"]
        mu = g.sum() / len(g)
        s = (g - mu).abs().sort_values().reset_index(drop=True)
        k = (9 * (len(g) + 1) + 9) // 10
        assert abs(round(s.iloc[k - 1], 4) - r["qhat"]) < 1e-9
        assert r["n_cal"] == len(g) and r["k"] == k
