"""Round-10 capability wave: cross-snapshot incremental dedup ledger,
robots/licence policy gate, truncation-loss audit, and the bounds-oracle
rework of the two built-in-sketch queries (every invariant column must be
TRUE — the driver oracle compares them against literal TRUE)."""

from __future__ import annotations

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries._util import t

REGISTRY = load_registry()


def test_cross_snapshot_ledger_telescopes(spark, sf_dir):
    out = REGISTRY["cross_snapshot_dedup"].fn(spark, sf_dir).toPandas()
    out = out.sort_values("day").reset_index(drop=True)
    # every day present, day 0 probes an empty store
    assert list(out["day"]) == [0, 1, 2, 3]
    assert out.loc[0, "n_dup_vs_store"] == 0
    assert out.loc[0, "dup_frac"] == 0.0
    # per-day accounting telescopes
    assert (out["n_novel"] + out["n_dup_vs_store"] == out["n_ingested"]).all()
    assert out["n_ingested"].sum() == t(spark, sf_dir, "documents").count()
    # signature cells are attributed exactly once across days
    from profitscout_engine_spark.queries.similarity import _mh_bands

    n_cells = (
        _mh_bands(spark, sf_dir).select("band_id", "band_sig").distinct().count()
    )
    assert out["n_new_sig_cells"].sum() == n_cells


def test_robots_policy_gate_accounting(spark, sf_dir):
    out = REGISTRY["robots_policy_filter"].fn(spark, sf_dir).toPandas()
    # drop reasons + kept telescope to the domain total
    assert (
        out["n_kept"]
        + out["n_drop_robots"]
        + out["n_drop_license"]
        + out["n_drop_path"]
        == out["n_docs"]
    ).all()
    assert out["n_docs"].sum() == t(spark, sf_dir, "documents").count()
    # precedence: a crawl-blocked domain reports ONLY robots drops
    blocked = out[~out["crawl_ok"]]
    assert (blocked["n_kept"] == 0).all()
    assert (blocked["n_drop_license"] == 0).all()
    assert (blocked["n_drop_path"] == 0).all()
    assert (blocked["tokens_kept"] == 0).all()
    # all-rights-reserved domains that ARE crawlable drop everything on licence
    arr = out[out["crawl_ok"] & (out["license"] == "all-rights-reserved")]
    assert (arr["n_kept"] == 0).all()
    assert (arr["n_drop_license"] == arr["n_docs"]).all()
    # kept docs exist somewhere (the md5 policy split keeps most domains open)
    assert out["n_kept"].sum() > 0


def test_truncation_audit_token_identity(spark, sf_dir):
    out = REGISTRY["packing_truncation_audit"].fn(spark, sf_dir).toPandas()
    assert (out["tokens_kept"] + out["tokens_lost"] == out["tokens_total"]).all()
    from profitscout_engine_spark.queries.curation import LEN_BUCKET, SEQ_MAX

    # buckets entirely below SEQ_MAX truncate nothing and lose nothing
    low = out[(out["len_bucket"] + 1) * LEN_BUCKET <= SEQ_MAX]
    assert (low["n_truncated"] == 0).all() and (low["tokens_lost"] == 0).all()
    # buckets entirely above SEQ_MAX truncate everything and pad nothing
    high = out[out["len_bucket"] * LEN_BUCKET > SEQ_MAX]
    assert (high["n_truncated"] == high["n_docs"]).all()
    assert (high["pad_tokens"] == 0).all()
    # totals cover the corpus
    assert out["n_docs"].sum() == t(spark, sf_dir, "documents").count()


def test_sketch_bounds_hold(spark, sf_dir):
    d = REGISTRY["approx_distinct_sketch"].fn(spark, sf_dir).toPandas()
    assert d["within_bound"].all()
    q = REGISTRY["approx_quantile_sketch"].fn(spark, sf_dir).toPandas()
    assert q["b25"].all() and q["b50"].all() and q["b75"].all()


def test_sample_trainer_bounded_and_comparable(spark, sf_dir):
    out = REGISTRY["kmeans_sample_train"].fn(spark, sf_dir).toPandas()
    from profitscout_engine_spark.queries.similarity import KM_SAMPLE_N, KM_TRAIN_K

    n_vec = t(spark, sf_dir, "embeddings").count()
    assert len(out) == min(KM_TRAIN_K, n_vec)
    # the full corpus is assigned; exactly the bounded sample is marked
    assert out["n_members"].sum() == n_vec
    assert out["n_sample_members"].sum() == min(KM_SAMPLE_N, n_vec)
    assert (out["n_sample_members"] <= out["n_members"]).all()
    # a bounded sample must train an index whose full-corpus inertia is in
    # the same regime as full-corpus training (the production question the
    # report answers); Lloyd local optima differ, so pin a loose envelope
    full = REGISTRY["kmeans_train_converged"].fn(spark, sf_dir).toPandas()
    si, fi = out["inertia"].sum(), full["inertia"].sum()
    assert si > 0 and fi > 0
    assert si <= 3 * fi
