"""Oracle correctness: every registered query with oracle SQL must match
DuckDB exactly (the driver's t2 gate, run here at sf0.001 for speed).

Queries without oracle SQL get a rows-and-schema smoke check.
"""

from __future__ import annotations

import pytest

from profitscout_engine_spark.queries import load_registry

from .conftest import assert_frames_match

REGISTRY = load_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf.columns) > 0
        return
    odf = oracle.sql(spec.oracle).df()
    assert_frames_match(sdf, odf, name)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)


def test_driver_window_order_is_pinned():
    """The driver verifies the FIRST 50 registered queries. Round-7 rotation
    (VERDICT r6 — stale-green priority): the 10 never-driver-checked round-6
    additions lead, then every query whose (source + oracle) hash changed
    since its last green driver row (2x-sweep oracle fixes, tag-hygiene
    edits, ranks.py-interpolation consumers), then the oldest (r2-vintage)
    greens as freshness re-rows, with the tail slots reserved for round-7
    additions. A green CORRECTNESS_r07 re-verifies every stale green."""
    from profitscout_engine_spark.queries import _WINDOW_FRONT

    names = list(load_registry())
    assert names[: len(_WINDOW_FRONT)] == list(_WINDOW_FRONT)
    assert len(_WINDOW_FRONT) <= 50
    # the never-driver-checked round-6 additions lead the window
    assert names[0] == "weighted_median_price"
    window = set(names[:50])
    assert {
        "neyman_allocation",
        "changepoint_binseg",
        "image_dhash_neardup",
        "token_budget_epochs",
        # stale greens re-entering for re-verification
        "equi_depth_histogram",
        "rfm_segmentation",
        "group_quantiles",
        "fulfillment_latency",
        "wintracker_pipeline",
    } <= window
    # round-6-verified names must be GONE from the front
    assert not {
        "sliding_window_rate",
        "systematic_resample",
        "conformal_calibration",
        "dp_noisy_counts",
    } & set(_WINDOW_FRONT)
