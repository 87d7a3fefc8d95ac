"""Salting equivalence: the skew-mitigated plans must return exactly the
rows/values of their naive forms (the whole point — same answer, spread
reducers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from profitscout_engine_spark.catalog import table
from profitscout_engine_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    salted = (
        salted_aggregate(
            li.select("l_returnflag", "l_quantity", "l_extendedprice"),
            keys=["l_returnflag"],
            sums=["l_quantity"],
            count="n",
            mins=["l_extendedprice"],
            maxs=["l_extendedprice"],
            buckets=16,
        )
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_l_quantity"),
            F.count("*").alias("n"),
            F.min("l_extendedprice").alias("min_l_extendedprice"),
            F.max("l_extendedprice").alias("max_l_extendedprice"),
        )
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert (salted["l_returnflag"] == plain["l_returnflag"]).all()
    assert (salted["n"] == plain["n"]).all()
    assert (salted["sum_l_quantity"] == plain["sum_l_quantity"]).all()  # integral → exact
    assert (salted["min_l_extendedprice"] == plain["min_l_extendedprice"]).all()
    assert (salted["max_l_extendedprice"] == plain["max_l_extendedprice"]).all()


def test_salted_join_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    salted = (
        salted_join(li, supp, on="l_suppkey", buckets=8)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .toPandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    plain = (
        li.join(supp, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
        .toPandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    assert (salted["n"] == plain["n"]).all()
    assert (salted["q"] == plain["q"]).all()
    assert len(salted) == len(plain)


def test_salted_join_outer_semantics(spark):
    """Left join: probe rows with no build match survive exactly once."""
    probe = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    build = spark.createDataFrame([(1, "X")], "k int, w string")
    out = salted_join(probe, build, on="k", how="left", buckets=4).toPandas()
    assert len(out) == 3
    matched = out[out.k == 1]
    assert len(matched) == 1 and matched.iloc[0].w == "X"
    assert out[out.k == 2].iloc[0].w is None


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """The sketch queries carry their error envelopes as INVARIANT COLUMNS
    since the round-10 bounds-oracle rework (the oracle compares them to
    literal TRUE over the exact statistics): every bound column must hold,
    and the exact twin each query computes alongside must reconcile with
    an independently computed exact form."""
    from profitscout_engine_spark.queries import load_registry

    R = load_registry()
    li = table(spark, sf_dir, "lineitem")

    approx = R["approx_distinct_sketch"].fn(spark, sf_dir).toPandas().set_index("l_suppkey")
    assert approx["within_bound"].all()
    exact = (
        li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .toPandas()
        .set_index("l_suppkey")
    )
    joined = approx.join(exact)
    assert (joined.exact_parts == joined.n).all()

    aq = R["approx_quantile_sketch"].fn(spark, sf_dir).toPandas().set_index("l_returnflag")
    assert aq[["b25", "b50", "b75"]].all().all()
    en = li.groupBy("l_returnflag").count().toPandas().set_index("l_returnflag")
    assert (aq["n_rows"] == en["count"]).all()


def test_salted_join_rejects_outer_shapes(spark, sf_dir):
    import pytest

    li = table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey")
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(li, supp.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey", how=how)


def test_skewsafe_pair_gen_hot_shingle(spark, tmp_path):
    """One stop-shingle shared by 150 docs (far past the hot_df threshold):
    the salted pair generator must (a) return exactly the naive self-join's
    rows, (b) actually route the hot key through the salted branch with its
    probe rows spread across salt buckets."""
    import pandas as pd

    from profitscout_engine_spark.operators.skew import skewsafe_pair_gen
    from profitscout_engine_spark.queries.similarity import HOT_SHINGLE_DF

    n_hot = 150
    assert n_hot > HOT_SHINGLE_DF
    rows = [(i, "the quick brown fox%d jumps" % i) for i in range(n_hot)]
    rows += [(1000 + i, "totally unrelated text block %d variant" % i) for i in range(20)]
    posting = []
    for doc_id, text in rows:
        tk = text.split()
        for j in range(len(tk) - 2):
            posting.append((doc_id, " ".join(tk[j : j + 3])))
    sh = spark.createDataFrame(
        pd.DataFrame(posting, columns=["doc_id", "shingle"])
    ).dropDuplicates(["doc_id", "shingle"])

    got = (
        skewsafe_pair_gen(sh, key="shingle", id_col="doc_id", hot_df=HOT_SHINGLE_DF, buckets=8)
        .groupBy("d1", "d2").count().toPandas()
        .sort_values(["d1", "d2"]).reset_index(drop=True)
    )
    a, b = sh.alias("a"), sh.alias("b")
    naive = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .count().toPandas().sort_values(["d1", "d2"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, naive)

    # the hot branch really fires and its probe rows spread over buckets
    hot_probe = (
        sh.groupBy("shingle").count().where(F.col("count") > HOT_SHINGLE_DF).join(sh, "shingle")
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(8)))
    )
    n_salts = hot_probe.select("salt").distinct().count()
    assert hot_probe.count() >= n_hot
    assert n_salts >= 6, f"hot rows collapsed onto {n_salts} salt buckets"


def test_skewsafe_directed_pairs_hot_list(spark):
    """One artificially hot coarse list (3000 members vs 20): the salted
    candidate gen must return exactly the naive join's (a_id, b_id) rows,
    with the hot list actually split across salt buckets."""
    from profitscout_engine_spark.operators.skew import skewsafe_directed_pairs

    rows = [("hot", i) for i in range(3000)] + [("cold", i + 10_000) for i in range(20)]
    assign = spark.createDataFrame(rows, "lst string, vec_id long")
    probe = assign.select("lst", F.col("vec_id").alias("a_id"))
    build = assign.select("lst", F.col("vec_id").alias("b_id"))

    naive = (
        probe.join(build, "lst")
        .where(F.col("a_id") != F.col("b_id"))
        .groupBy("a_id")
        .agg(F.count("*").alias("n"), F.sum("b_id").alias("s"))
    )
    safe = (
        skewsafe_directed_pairs(
            probe, build, key="lst", probe_id="a_id", build_id="b_id",
            hot_size=64, buckets=8,
        )
        .groupBy("a_id")
        .agg(F.count("*").alias("n"), F.sum("b_id").alias("s"))
    )
    a = naive.toPandas().sort_values("a_id").reset_index(drop=True)
    b = safe.toPandas().sort_values("a_id").reset_index(drop=True)
    assert a.equals(b)

    # The hot list genuinely takes the salted path: its build side is
    # replicated across all 8 buckets (tasks), the cold list is not.
    from profitscout_engine_spark.operators.skew import SALT

    hot_b = (
        build.join(build.groupBy("lst").agg(F.count("*").alias("_lsz")), "lst")
        .where(F.col("_lsz") > 64)
        .withColumn(SALT, F.pmod(F.xxhash64("b_id"), F.lit(8)))
    )
    assert hot_b.select(SALT).distinct().count() == 8
