"""Property and cross-query consistency tests for the extra-session wave
(TPC-H completion is covered in test_tpch.py; these pin the analytics
semantics of the new operators against each other and against closed
invariants)."""

from __future__ import annotations

import pytest

from profitscout_engine_spark.queries import load_registry

REGISTRY = load_registry()


def _run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def test_attribution_models_conserve_value(spark, sf_dir):
    """Every model distributes exactly each attributed conversion's value,
    so the three models' totals agree (up to the 1e-6 fixed-point grain
    per linear credit)."""
    rows = _run(spark, sf_dir, "multi_touch_attribution").collect()
    totals, credits = {}, {}
    for r in rows:
        totals[r["model"]] = totals.get(r["model"], 0.0) + r["attributed_value"]
        credits[r["model"]] = credits.get(r["model"], 0) + r["n_credits"]
    assert set(totals) == {"first_touch", "last_touch", "linear"}
    assert totals["first_touch"] == pytest.approx(totals["last_touch"], abs=1e-6)
    assert totals["linear"] == pytest.approx(
        totals["first_touch"], abs=credits["linear"] * 1e-6 + 0.01
    )
    # single-credit models hand out exactly one credit per attributed
    # conversion, so their credit counts agree
    assert credits["first_touch"] == credits["last_touch"]


def test_cep_sessions_match_session_windows(spark, sf_dir):
    """sequence_pattern_match sessionizes with the same 30-min gap as
    session_windows — the two queries must see the same session count,
    and the per-session event counts must sum to the event total."""
    cep = _run(spark, sf_dir, "sequence_pattern_match")
    sw = _run(spark, sf_dir, "session_windows")
    assert cep.count() == sw.count()
    from profitscout_engine_spark.catalog import table

    n_events = table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in cep.select("n_events").collect()) == n_events


def test_threshold_sweep_monotone(spark, sf_dir):
    """Raising the similarity threshold only removes edges, so edge,
    node, and max-cluster counts are non-increasing in θ."""
    rows = sorted(
        _run(spark, sf_dir, "threshold_sweep_components").collect(),
        key=lambda r: r["threshold"],
    )
    for a, b in zip(rows, rows[1:]):
        assert a["n_edges"] >= b["n_edges"]
        assert a["n_nodes"] >= b["n_nodes"]
        assert a["max_cluster_size"] >= b["max_cluster_size"]


def test_corpus_filter_partitions_corpus(spark, sf_dir):
    """One verdict per document; keep XOR drop_reason; drop reasons only
    from the declared ladder."""
    df = _run(spark, sf_dir, "corpus_filter_pipeline")
    rows = df.collect()
    from profitscout_engine_spark.catalog import table

    assert len(rows) == table(spark, sf_dir, "documents").count()
    ladder = {
        "too_short", "low_quality", "repetitive_tokens", "dup_3grams",
        "consec_repeat",
    }
    for r in rows:
        assert r["keep"] == (r["drop_reason"] is None)
        if r["drop_reason"] is not None:
            assert r["drop_reason"] in ladder


def test_contamination_spread_seeds_match_check(spark, sf_dir):
    """Hop-0 nodes are exactly contamination_check's contaminated docs;
    hops never exceed the bound; every reached doc has a finite hop."""
    spread = {
        r["doc_id"]: r["hop"]
        for r in _run(spark, sf_dir, "contamination_spread").collect()
    }
    seeds = {
        r["doc_id"]
        for r in _run(spark, sf_dir, "contamination_check").collect()
        if r["contaminated"]
    }
    assert {d for d, h in spread.items() if h == 0} == seeds
    assert all(0 <= h <= 3 for h in spread.values())


def test_acf_bounded_and_chi2_nonnegative(spark, sf_dir):
    acf = _run(spark, sf_dir, "autocorrelation_acf").collect()
    assert len(acf) == 24
    assert all(abs(r["acf"]) <= 1.0 + 1e-6 for r in acf)
    chi = _run(spark, sf_dir, "chi_square_independence").collect()[0]
    assert chi["chi2"] >= 0.0
    assert chi["dof"] >= 1


def test_seasonal_anomaly_flags_are_extreme(spark, sf_dir):
    """Every flagged hour really deviates by >3 robust sigmas (the
    robust_z column must agree with the filter that produced the row)."""
    rows = _run(spark, sf_dir, "seasonal_anomaly").collect()
    assert all(abs(r["robust_z"]) > 3.0 for r in rows)


def test_table_checksum_detects_single_row_change(spark, sf_dir, oracle):
    """The whole point of the checksum: one changed row must flip its
    partition's checksum and leave every other partition untouched
    (replayed in DuckDB by perturbing one row's price)."""
    base = {
        r[0]: (r[1], r[2])
        for r in oracle.sql(REGISTRY["table_checksum"].oracle).fetchall()
    }
    mutated_view = REGISTRY["table_checksum"].oracle.replace(
        "FROM orders",
        """FROM (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
                        THEN o_totalprice + 1.0 ELSE o_totalprice END
                       AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders
        )""",
    )
    mutated = {r[0]: (r[1], r[2]) for r in oracle.sql(mutated_view).fetchall()}
    assert set(base) == set(mutated)
    diffs = [y for y in base if base[y] != mutated[y]]
    assert len(diffs) == 1
    y = diffs[0]
    assert base[y][0] == mutated[y][0]  # same row count
    assert base[y][1] != mutated[y][1]  # flipped checksum
