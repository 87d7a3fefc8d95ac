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
    """The driver verifies the FIRST 50 registered queries. Rotation
    contract: _WINDOW_FRONT holds the full never-driver-verified backlog
    in age order (oldest first), so this round's window takes the first
    50 and later rounds rotate by deleting the verified prefix. Round 5
    deleted the 50 names that went hash-green in CORRECTNESS_r04, so the
    late-r3 backlog now leads."""
    from profitscout_engine_spark.queries import _WINDOW_FRONT

    names = list(load_registry())
    assert names[: len(_WINDOW_FRONT)] == list(_WINDOW_FRONT)
    assert len(_WINDOW_FRONT) >= 50
    window = set(names[:50])
    # age-order head: backlog positions 51-100 of the r4 ordering
    assert {"q22_dormant_balance", "fuzzy_dedup_edit", "triangle_count"} <= window
    # r4-verified names must be GONE from the front
    assert not {"hll_distinct_portable", "rsi_macd", "monte_carlo_paths"} & set(
        _WINDOW_FRONT
    )
