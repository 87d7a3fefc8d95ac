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
    """The driver verifies the FIRST 50 registered queries. Round-8 rotation
    (VERDICT r7 item 1): the only 2 never-driver-checked queries lead, then
    the 2 sweep-basis restamps (MATERIALIZED-CTE oracle fixes after their
    last driver row), then queries edited this round, then the oldest
    (r2/r3-vintage) greens as freshness re-rows, with the tail slots
    reserved for round-8 additions."""
    from profitscout_engine_spark.queries import _WINDOW_FRONT

    names = list(load_registry())
    assert names[: len(_WINDOW_FRONT)] == list(_WINDOW_FRONT)
    assert len(_WINDOW_FRONT) <= 50
    # the never-driver-checked round-7 additions lead the window
    assert names[0] == "community_top_terms"
    assert names[1] == "late_interaction_maxsim"
    window = set(names[:50])
    assert {
        "dedup_consensus",
        "threshold_sweep_components",
        # edited this round — stamps stale by construction
        "kmeans_train_converged",
        "expectation_audit",
        # freshness re-rows (r2/r3 vintage)
        "minhash_lsh_pairs",
        "scanner_rank",
        "approx_distinct_sketch",
        "date_span_rates",
    } <= window
    # round-7-verified names must be GONE from the front
    assert not {
        "weighted_median_price",
        "neyman_allocation",
        "image_dhash_neardup",
        "cross_modal_dedup_audit",
        "pagerank_power_lattice",
    } & set(_WINDOW_FRONT)
