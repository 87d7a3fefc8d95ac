"""Property-based tests (SURVEY §5.3) over the scalar expression families:
ladder monotonicity, tier exhaustiveness, coalesce order-sensitivity,
guarded-division totality, stable-round half-up semantics. Hypothesis
generates the inputs; Spark evaluates the very Column expressions the
queries use (not a Python re-implementation)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from profitscout_engine_spark.exprs import (
    clamp,
    coalesce_chain,
    guarded_div,
    pct_change,
    stable_round,
    step_ladder,
    tier_ladder,
)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)
maybe = st.one_of(st.none(), finite)

LADDER = [(8.0, 3), (5.0, 2), (3.0, 1)]
TIERS = [(5.0, "strong"), (3.0, "solid"), (1.0, "edge"), (0.0, "flat")]


def _eval(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    return [r.out for r in df.select(col.alias("out")).collect()]


@settings(max_examples=6, deadline=None)
@given(st.lists(finite, min_size=2, max_size=40))
def test_step_ladder_monotone(spark, values):
    """v1 <= v2 ⇒ ladder(v1) <= ladder(v2) for a descending-threshold ladder."""
    rows = [(float(v),) for v in sorted(values)]
    out = _eval(spark, rows, "v double", step_ladder(F.col("v"), LADDER))
    assert out == sorted(out)
    assert all(o in (0, 1, 2, 3) for o in out)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.one_of(finite, st.just(float("nan"))), min_size=1, max_size=30))
def test_tier_ladder_total(spark, values):
    """The tier CASE ladder covers every float (NaN falls to the default)."""
    rows = [(float(v),) for v in values]
    out = _eval(spark, rows, "v double", tier_ladder(F.col("v"), TIERS, "loss"))
    assert all(o in {"strong", "solid", "edge", "flat", "loss"} for o in out)
    assert None not in out


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(maybe, maybe, maybe), min_size=1, max_size=30))
def test_coalesce_chain_first_non_null(spark, triples):
    rows = [tuple(None if v is None else float(v) for v in t) for t in triples]
    out = _eval(
        spark,
        rows,
        "a double, b double, c double",
        coalesce_chain(F.col("a"), F.col("b"), F.col("c")),
    )
    for (a, b, c), o in zip(rows, out):
        expected = a if a is not None else (b if b is not None else c)
        assert o == expected


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=30))
def test_guarded_div_total_and_bounded(spark, pairs):
    """x / max(y, 1) never nulls/infs on finite input, and equals plain
    division whenever y >= 1."""
    rows = [(float(x), float(y)) for x, y in pairs]
    out = _eval(spark, rows, "x double, y double", guarded_div(F.col("x"), F.col("y")))
    for (x, y), o in zip(rows, out):
        assert o is not None and math.isfinite(o)
        if y >= 1.0:
            assert o == x / y


@settings(max_examples=6, deadline=None)
@given(st.lists(finite, min_size=1, max_size=30))
def test_clamp_bounds_and_idempotence(spark, values):
    rows = [(float(v),) for v in values]
    out = _eval(spark, rows, "v double", clamp(F.col("v"), 0.0, 10.0))
    out2 = _eval(spark, [(o,) for o in out], "v double", clamp(F.col("v"), 0.0, 10.0))
    assert all(0.0 <= o <= 10.0 for o in out)
    assert out == out2


@settings(max_examples=6, deadline=None)
@given(st.lists(finite, min_size=1, max_size=30))
def test_stable_round_half_up(spark, values):
    """stable_round is floor(x·10ⁿ + 0.5)/10ⁿ — reproducible in plain
    Python on the same doubles (the property that makes oracle SQL and
    Spark agree bit-for-bit)."""
    rows = [(float(v),) for v in values]
    out = _eval(spark, rows, "v double", stable_round(F.col("v"), 2))
    for (v,), o in zip(rows, out):
        assert o == math.floor(v * 100.0 + 0.5) / 100.0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=20))
def test_pct_change_zero_base_nulls(spark, pairs):
    rows = [(float(n), float(o)) for n, o in pairs]
    out = _eval(spark, rows, "n double, o double", pct_change(F.col("n"), F.col("o")))
    for (n, o), r in zip(rows, out):
        if o == 0.0:
            assert r is None
        else:
            assert r is not None


def test_peak_return_dominates_daily(spark, sf_dir):
    """Data invariant (win-tracker W9): the 3-row peak-high pct must be
    ≥ every individual day close pct for bullish tracking."""
    from profitscout_engine_spark.queries import load_registry

    df = load_registry()["future_rows_top3"].fn(spark, sf_dir).toPandas()
    for c in ("day1_value", "day2_value", "day3_value"):
        sub = df.dropna(subset=[c, "peak_value"])
        assert (sub["peak_value"] >= sub[c] - 1e-9).all(), c


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 9)),  # (doc_id, shingle_idx)
        min_size=1,
        max_size=120,
    ),
    st.integers(1, 6),  # hot_df threshold — small, so salting actually fires
)
def test_skewsafe_pair_gen_equals_naive_join(spark, posting_rows, hot_df):
    """For ANY posting list and ANY threshold, the salted pair generator is
    row-identical (with multiplicity) to the naive inverted-index
    self-join — the equivalence that keeps the oracle valid."""
    from profitscout_engine_spark.operators.skew import skewsafe_pair_gen

    rows = sorted({(d, f"s{k}") for d, k in posting_rows})
    sh = spark.createDataFrame(rows, "doc_id int, shingle string")
    got = sorted(
        map(tuple, skewsafe_pair_gen(sh, "shingle", "doc_id", hot_df=hot_df, buckets=4)
            .groupBy("d1", "d2").count().collect())
    )
    a, b = sh.alias("a"), sh.alias("b")
    exp = sorted(
        map(tuple,
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .count().collect())
    )
    assert got == exp


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(finite, min_size=4, max_size=4), min_size=1, max_size=25))
def test_seq_dot_udf_matches_sequential_fold(spark, vectors):
    """The Arrow dot kernel must equal the left-associated sequential sum
    BIT-FOR-BIT for any doubles (the property its oracle exactness
    rests on)."""
    from profitscout_engine_spark.operators.similarity import seq_dot_udf

    rows = [(i, [float(x) for x in v], [float(x) for x in reversed(v)])
            for i, v in enumerate(vectors)]
    df = spark.createDataFrame(rows, "id int, va array<double>, vb array<double>")
    dot = seq_dot_udf()
    got = {r.id: r.d for r in df.select("id", dot("va", "vb").alias("d")).collect()}
    for i, v in enumerate(vectors):
        acc = 0.0
        for x, y in zip(v, list(reversed(v))):
            acc = acc + x * y
        assert got[i] == acc, (i, got[i], acc)
