"""Portable probabilistic structures (queries/sketches.py): error-bound
invariants the oracle equality can't express — HLL relative error on both
correction branches, count-min one-sided error, bloom no-false-negatives —
plus plan-quality gates (broadcast probing, JVM-only)."""

from __future__ import annotations

import contextlib
import io

from profitscout_engine_spark.queries import load_registry

REGISTRY = load_registry()


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        REGISTRY[name].fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_hll_relative_error_both_branches(spark, sf_dir):
    """m=256 gives ~6.5% standard error; assert a loose 3-sigma bound on
    the raw-estimator branch (partkeys) AND the linear-counting branch
    (suppkeys, cardinality << 2.5m)."""
    pdf = REGISTRY["hll_distinct_portable"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    for _, r in pdf.iterrows():
        assert abs(r.hll_parts - r.exact_parts) / r.exact_parts < 0.20, dict(r)
        assert abs(r.hll_supps - r.exact_supps) / r.exact_supps < 0.20, dict(r)


def test_countmin_error_is_one_sided(spark, sf_dir):
    """Count-min never undercounts (min over rows of sums >= true), and
    the probe returns every distinct token exactly once."""
    pdf = REGISTRY["countmin_freq_portable"].fn(spark, sf_dir).toPandas()
    assert (pdf.overcount >= 0).all()
    assert (pdf.cms_cnt == pdf.exact_cnt + pdf.overcount).all()
    assert pdf.token.is_unique
    # w=64 is deliberately tight: total mass per row equals the corpus
    # token count, so estimates stay within one row's worst bucket.
    assert (pdf.cms_cnt <= pdf.exact_cnt.sum()).all()


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every true match passes the filter (the bloom guarantee); the
    false-positive rate stays under the design bound for m=4096, k=2."""
    pdf = REGISTRY["bloom_semijoin_account"].fn(spark, sf_dir).toPandas()
    assert (pdf.n_bloom_pass >= pdf.n_true).all()
    assert (pdf.n_false_pos == pdf.n_bloom_pass - pdf.n_true).all()
    assert (pdf.fp_rate < 0.25).all()


def test_bloom_probe_side_joins_are_broadcast(spark, sf_dir):
    """The probe (orders) must flow through broadcast hash joins against
    the tiny bit-position tables — never a shuffled join: the point of a
    bloom pre-filter is that the 100 TB side does not move."""
    plan = _plan(spark, sf_dir, "bloom_semijoin_account")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_sketch_queries_stay_jvm_side(spark, sf_dir):
    for name in ("hll_distinct_portable", "countmin_freq_portable", "bloom_semijoin_account"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
