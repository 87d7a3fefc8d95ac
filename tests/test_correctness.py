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
    """The driver verifies the FIRST 50 registered queries. Round-6 rotation
    (VERDICT r5): the 49 names hash-green in CORRECTNESS_r05 were deleted,
    keeping the one red row (sliding_window_rate — comparator-parity tz
    defect, fixed this round) IN the window plus the 47 never-checked
    backlog names = 48, plus the two round-6 additions (systematic_resample,
    conformal_calibration) in the free slots = 50. A green CORRECTNESS_r06
    therefore driver-verifies every oracle-paired query in the registry."""
    from profitscout_engine_spark.queries import _WINDOW_FRONT

    names = list(load_registry())
    assert names[: len(_WINDOW_FRONT)] == list(_WINDOW_FRONT)
    assert len(_WINDOW_FRONT) == 50
    # the red row stays in, at the head
    assert names[0] == "sliding_window_rate"
    window = set(names[:50])
    # never-driver-checked backlog + round-5 additions are all inside
    assert {
        "autocorrelation_acf",
        "pq_encode",
        "stream_dedup_bands",
        "exact_substring_dedup",
        "sweep_grid_full",
        "curriculum_stage_split",
        "systematic_resample",
        "conformal_calibration",
    } <= window
    # r5-verified names must be GONE from the front
    assert not {"q22_dormant_balance", "fuzzy_dedup_edit", "triangle_count"} & set(
        _WINDOW_FRONT
    )
