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
    """The driver verifies the FIRST 50 registered queries. Round-10 rotation
    (VERDICT r9 item 1): the 16 plan-sha-migrated sweep-basis restamps LEAD
    (the r9 restamp queue), then queries edited this round (both approx
    sketches now carry bounds oracles — their first-ever hash-checked driver
    rows), then round-10 additions, then the oldest (r3- then r4-vintage)
    greens as freshness re-rows."""
    from profitscout_engine_spark.queries import _WINDOW_FRONT

    names = list(load_registry())
    assert names[: len(_WINDOW_FRONT)] == list(_WINDOW_FRONT)
    assert len(_WINDOW_FRONT) == 50
    # the r9 sweep-basis restamp queue leads the window
    assert names[:4] == [
        "ann_recall_curve",
        "bigram_lm_logprob",
        "dbscan_core_points",
        "dedup_consensus",
    ]
    window = set(names[:50])
    assert {
        # sweep-basis restamps
        "threshold_sweep_components",
        "triangle_count",
        # edited this round — stamps stale by construction; the sketches'
        # new bounds oracles get their first hash-checked driver rows
        "approx_distinct_sketch",
        "approx_quantile_sketch",
        "corpus_curation_pipeline",
        "smart_batching_waste",
        "url_canonical_dedup",
        # round-10 additions
        "cross_snapshot_dedup",
        "robots_policy_filter",
        "packing_truncation_audit",
        "kmeans_sample_train",
        "crawl_budget_allocator",
        # freshness re-rows (r3 then r4 vintage)
        "string_extract",
        "window_extrema",
        "anti_join_dormant_customers",
        "interval_peak_load",
    } <= window
    # round-9-verified names must be GONE from the front
    assert not {
        "embedding_health_stats",
        "knn_graph_sparsify",
        "tokenizer_fertility",
        "two_hop_candidates",
        "benford_audit",
        "corpus_filter_pipeline",
        "incremental_lpa_delta",
        "boilerplate_lines",
        "dedup_rank",
    } & set(_WINDOW_FRONT)
