"""Property tests for the final round-3 wave — invariants the oracle hash
can't express: blocked-algorithm completeness vs brute force, monotone
cluster refinement, statistical bounds."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries.similarity import (
    EDIT_MAXLEN_DIFF,
    EDIT_PREFIX,
    EDIT_RADIUS,
    PF_JACCARD_MIN,
)

REGISTRY = load_registry()


def test_fuzzy_dedup_blocking_is_complete(spark, sf_dir):
    """The (lang, length-bucket ±1) blocking must find EXACTLY the pairs
    the declared predicate admits — verified against an all-pairs scan
    (affordable at test scale only)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars", F.substring("text", 1, EDIT_PREFIX).alias("p")
    )
    a = docs.alias("a")
    b = docs.select(
        F.col("doc_id").alias("d2"), F.col("lang").alias("l2"),
        F.col("n_chars").alias("n2"), F.col("p").alias("p2"),
    )
    brute = (
        a.join(
            b,
            (F.col("a.lang") == F.col("l2"))
            & (F.col("a.doc_id") < F.col("d2"))
            & (F.abs(F.col("a.n_chars") - F.col("n2")) <= EDIT_MAXLEN_DIFF),
        )
        .where(F.levenshtein(F.col("a.p"), F.col("p2")) <= EDIT_RADIUS)
        .select(F.col("a.doc_id").alias("d1"), "d2")
        .toPandas()
        .sort_values(["d1", "d2"])
        .reset_index(drop=True)
    )
    blocked = (
        REGISTRY["fuzzy_dedup_edit"].fn(spark, sf_dir)
        .select("d1", "d2")
        .toPandas()
        .sort_values(["d1", "d2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(blocked, brute)


def test_prefix_filter_complete_at_other_thresholds(spark, sf_dir):
    """Prefix filtering loses no qualifying pair at thresholds besides the
    registered one (the oracle proves t=PF_JACCARD_MIN; this pins the
    theorem, not the constant)."""
    from profitscout_engine_spark.queries.similarity import (
        _sh_common_counts,
        _sh_distinct,
        _sh_sizes,
    )
    from pyspark.sql import Window

    for t_ in (0.3, 0.7):
        sh = _sh_distinct(spark, sf_dir)
        sizes = _sh_sizes(spark, sf_dir)
        common = _sh_common_counts(spark, sf_dir)
        j = F.col("c") / (F.col("ca.n") + F.col("cb.n") - F.col("c"))
        naive = (
            common.join(sizes.alias("ca"), F.col("d1") == F.col("ca.doc_id"))
            .join(sizes.alias("cb"), F.col("d2") == F.col("cb.doc_id"))
            .where(j >= t_)
            .select("d1", "d2")
        )
        dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        wd = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
        plen = (F.col("n") - F.ceil(F.lit(t_) * F.col("n")) + 1).cast("long")
        prefix = (
            sh.join(dfreq, "shingle").join(sizes, "doc_id")
            .withColumn("rn", F.row_number().over(wd))
            .where(F.col("rn") <= plen)
            .select("doc_id", "shingle")
        )
        a, b = prefix.alias("a"), prefix.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .distinct()
        )
        missed = naive.join(cand, ["d1", "d2"], "left_anti").count()
        assert missed == 0, f"prefix filter missed {missed} pairs at t={t_}"


def test_consensus_refines_minhash_components(spark, sf_dir):
    """Adding SimHash/edit edges can only MERGE MinHash components, never
    split them: every MinHash component maps into exactly one consensus
    component."""
    from profitscout_engine_spark.operators.graph import connected_components
    from profitscout_engine_spark.queries.similarity import _mh_pairs

    mh_cc = connected_components(_mh_pairs(spark, sf_dir)).toPandas()
    if mh_cc.empty:
        return
    reg = REGISTRY["dedup_consensus"].fn(spark, sf_dir)
    # rebuild node→consensus-component mapping from the edge union
    from profitscout_engine_spark.queries.similarity import (
        fuzzy_dedup_edit,
        simhash_pairs,
    )

    edges = (
        _mh_pairs(spark, sf_dir).select("d1", "d2")
        .unionByName(simhash_pairs(spark, sf_dir).select("d1", "d2"))
        .unionByName(fuzzy_dedup_edit(spark, sf_dir).select("d1", "d2"))
        .distinct()
    )
    cons = connected_components(edges).toPandas().set_index("node")["comp"]
    mh_cc["cons"] = mh_cc["node"].map(cons)
    n_images = mh_cc.groupby("comp")["cons"].nunique()
    assert (n_images == 1).all(), "a MinHash component split across consensus components"
    # and the registered report is consistent with the rebuilt graph
    rep = reg.toPandas()
    assert int(rep["cluster_size"].sum()) == int(cons.index.nunique())


def test_equi_depth_buckets_are_balanced(spark, sf_dir):
    """Equi-depth by construction: every bucket within ±1% of n/10 (exact
    percentile boundaries; ties go strictly to the lower bucket)."""
    rep = REGISTRY["equi_depth_histogram"].fn(spark, sf_dir).toPandas()
    n = rep["n_rows"].sum()
    assert len(rep) == 10
    assert (rep["n_rows"] >= n / 10 - max(2, 0.01 * n)).all()
    assert (rep["n_rows"] <= n / 10 + max(2, 0.01 * n)).all()
    # boundaries are monotone: bucket i's hi <= bucket i+1's lo is not
    # guaranteed (shared boundary values), but lo <= hi within buckets is
    r = rep.sort_values("bucket")
    assert (r["lo"] <= r["hi"]).all()


def test_triangle_coefficient_bounds(spark, sf_dir):
    rep = REGISTRY["triangle_count"].fn(spark, sf_dir).toPandas()
    if rep.empty:
        return
    assert (rep["clustering_coeff"] >= 0).all()
    assert (rep["clustering_coeff"] <= 1).all()
    # triangle participation needs degree >= 2
    assert (rep.loc[rep["n_triangles"] > 0, "degree"] >= 2).all()


def test_rolling_median_matches_pandas(spark, sf_dir):
    got = (
        REGISTRY["rolling_median_value"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
    )
    exp = []
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        med = g["value"].rolling(11, min_periods=1).apply(
            lambda w: sorted(w)[(len(w) + 1) // 2 - 1], raw=False
        )
        exp.append(pd.DataFrame({"event_id": g["event_id"], "expected": med}))
    exp = pd.concat(exp).sort_values("event_id").reset_index(drop=True)
    merged = got.merge(exp, on="event_id")
    pd.testing.assert_series_equal(
        merged["rolling_median"], merged["expected"],
        check_names=False, check_exact=True,
    )


def test_knn_eval_bounds(spark, sf_dir):
    rep = REGISTRY["knn_label_eval"].fn(spark, sf_dir).toPandas()
    if rep.empty:
        return
    assert (rep["accuracy"] >= 0).all() and (rep["accuracy"] <= 1).all()
    assert (rep["n_correct"] <= rep["n_vectors"]).all()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert rep["n_vectors"].sum() <= n_vecs


def test_coverage_doc_names_every_query():
    """COVERAGE.md is the judge-facing §2 map — every registered query
    must appear, and the structural sections must survive table
    regeneration (the blank-line-eating bug class)."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    src = open(path).read()
    missing = [n for n in REGISTRY if f"`{n}`" not in src]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"
    assert len(re.findall(r"^## ", src, re.M)) >= 7, "COVERAGE.md lost a section"
