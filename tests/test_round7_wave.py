"""Round-7 capability wave: iterated k-means training, cross-modal
near-dup audit (compaction tests live in test_txn.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries._util import t

REGISTRY = load_registry()


def test_kmeans_train_partitions_all_vectors(spark, sf_dir):
    """Cluster sizes sum to the corpus size; inertia and centroid sums
    are exact integers; exactly K clusters come back."""
    from profitscout_engine_spark.queries.similarity import KM_TRAIN_K

    out = REGISTRY["kmeans_train_converged"].fn(spark, sf_dir).toPandas()
    n_vecs = t(spark, sf_dir, "embeddings").count()
    assert len(out) == KM_TRAIN_K
    assert out["n_members"].sum() == n_vecs
    assert (out["inertia"] >= 0).all()
    assert out["n_members"].ge(0).all()


def test_kmeans_train_beats_or_matches_one_lloyd_step(spark, sf_dir):
    """Lloyd descent: total inertia after the trained iterations is <=
    the inertia of the SAME integer-lattice assignment after one
    iteration (computed inline) — iterating never hurts the objective
    on the lattice beyond rounding slack of one unit per dim."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))"
        ).alias("v"),
    )
    from profitscout_engine_spark.queries.similarity import KM_TRAIN_K

    init = e.orderBy("vec_id").limit(KM_TRAIN_K).collect()
    cent = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init)], "cid int, c array<bigint>"
    )
    dist = F.expr(
        "aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, (a, z) -> a + z)"
    )
    first = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", F.struct(dist.alias("d"), "cid").alias("s"))
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .agg(F.sum("s.d"))
        .collect()[0][0]
    )
    trained = (
        REGISTRY["kmeans_train_converged"]
        .fn(spark, sf_dir)
        .agg(F.sum("inertia"))
        .collect()[0][0]
    )
    assert trained <= first


def test_cross_modal_audit_is_consistent_with_parents(spark, sf_dir):
    """Every pair labeled text_only/both appears in the MinHash pair set,
    every image_only/both pair in the dHash set, and the -1 sentinels
    appear exactly on the missing side."""
    audit = REGISTRY["cross_modal_dedup_audit"].fn(spark, sf_dir).toPandas()
    text = {
        (r["d1"], r["d2"])
        for r in REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).collect()
    }
    img = {
        (r["d1"], r["d2"])
        for r in REGISTRY["image_dhash_neardup"].fn(spark, sf_dir).collect()
    }
    assert len(audit) == len(text | img)
    for _, r in audit.iterrows():
        pair = (r["d1"], r["d2"])
        if r["modality"] == "both":
            assert pair in text and pair in img
            assert r["n_shared_bands"] > 0 and r["hamming"] >= 0
        elif r["modality"] == "text_only":
            assert pair in text and pair not in img
            assert r["hamming"] == -1
        else:
            assert pair in img and pair not in text
            assert r["n_shared_bands"] == -1


def test_gram_power_iteration_converges_to_eigendirection(spark, sf_dir):
    """After the iterations, w = G v must be nearly parallel to v (the
    Rayleigh alignment of a converged power method); exactly 64
    components on the +-1000 lattice with max |v| == 1000."""
    import numpy as np

    g = REGISTRY["gram_power_iteration"].fn(spark, sf_dir).toPandas()
    assert len(g) == 64
    v = g.sort_values("pos")["v_val"].to_numpy(dtype=float)
    w = g.sort_values("pos")["w_val"].to_numpy(dtype=float)
    assert int(np.abs(v).max()) == 1000
    cos = float(np.dot(v, w) / (np.linalg.norm(v) * np.linalg.norm(w)))
    assert cos > 0.99


def test_expectation_audit_clean_fixture_and_violation_detection(
    spark, sf_dir, tmp_path
):
    """All seven expectations pass on the shipped fixture; planting a
    duplicate key, an orphan custkey, and an out-of-domain status in a
    doctored copy flips exactly those checks."""
    import os
    import shutil

    out = REGISTRY["expectation_audit"].fn(spark, sf_dir).toPandas()
    assert len(out) == 7 and bool(out["passed"].all())

    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    for tbl in ("orders", "lineitem", "customer"):
        shutil.copy(f"{sf_dir}/{tbl}.parquet", f"{bad_dir}/{tbl}.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    first = o.limit(1)
    doctored = o.unionAll(
        first.withColumn("o_custkey", F.lit(-999).cast(first.schema["o_custkey"].dataType))
             .withColumn("o_orderstatus", F.lit("X"))
    )
    doctored.write.mode("overwrite").parquet(f"{bad_dir}/orders.parquet")
    bad = (
        REGISTRY["expectation_audit"].fn(spark, bad_dir)
        .toPandas().set_index("check_name")
    )
    assert bad.loc["orders_orderkey_unique", "violations"] == 1
    assert bad.loc["orders_custkey_refs_customer", "violations"] == 1
    assert bad.loc["orders_status_in_domain", "violations"] == 1
    assert bool(bad.loc["orders_custkey_complete", "passed"])


def test_label_propagation_communities_are_consistent(spark, sf_dir):
    """Every doc appears exactly once; isolated docs keep their own id;
    connected docs' labels are drawn from their component (labels are
    doc_ids, so each community label must itself be a member doc)."""
    out = REGISTRY["label_propagation_rounds"].fn(spark, sf_dir).toPandas()
    n_docs = REGISTRY["label_propagation_rounds"].fn(spark, sf_dir).count()
    assert len(out) == n_docs == out["doc_id"].nunique()
    pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).toPandas()
    linked = set(pairs["d1"]) | set(pairs["d2"])
    iso = out[~out["doc_id"].isin(linked)]
    assert (iso["community"] == iso["doc_id"]).all()
    doc_ids = set(out["doc_id"])
    assert set(out["community"]) <= doc_ids


def test_community_top_terms_invariants(spark, sf_dir):
    """Keywords only for multi-member communities, at most CTFIDF_TOPK
    per community, ranks dense from 1, scores positive and
    non-increasing within a community."""
    from profitscout_engine_spark.queries.similarity import CTFIDF_TOPK

    out = REGISTRY["community_top_terms"].fn(spark, sf_dir).toPandas()
    comm = REGISTRY["label_propagation_rounds"].fn(spark, sf_dir).toPandas()
    multi = set(
        comm.groupby("community").size().loc[lambda s: s >= 2].index
    )
    assert set(out["community"]) <= multi
    for cid, g in out.groupby("community"):
        g = g.sort_values("rank")
        assert len(g) <= CTFIDF_TOPK
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score"] > 0).all()
        assert g["score"].is_monotonic_decreasing or len(g) == 1


def test_late_interaction_maxsim_bounds_and_brute_parity(spark, sf_dir):
    """MaxSim >= the single-vector full dot (the 4x4 grid's diagonal sum
    IS the full dot, and each max is >= its diagonal term); ranks dense
    from 1 with <= MAXSIM_TOPK per query."""
    from profitscout_engine_spark.queries.similarity import MAXSIM_TOPK

    out = REGISTRY["late_interaction_maxsim"].fn(spark, sf_dir).toPandas()
    assert (out.groupby("query_id")["rank"].max() <= MAXSIM_TOPK).all()
    for _, g in out.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    # brute parity on one pair: maxsim >= exact int dot of the full vectors
    import numpy as np

    e = {
        r["vec_id"]: np.array(
            [int(np.floor(x * 1e6 + 0.5)) for x in r["embedding"]], dtype=object
        )
        for r in t(spark, sf_dir, "embeddings").limit(200).collect()
    }
    checked = 0
    for _, r in out.iterrows():
        a, b = e.get(r["query_id"]), e.get(r["doc_id"])
        if a is None or b is None:
            continue
        full = int(np.dot(a, b))
        sl = [a[s * 16:(s + 1) * 16] for s in range(4)]
        sr = [b[s * 16:(s + 1) * 16] for s in range(4)]
        want = sum(max(int(np.dot(x, y)) for y in sr) for x in sl)
        assert r["maxsim"] == want and want >= full
        checked += 1
        if checked >= 10:
            break
    assert checked > 0
