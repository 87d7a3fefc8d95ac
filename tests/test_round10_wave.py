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


def test_cross_snapshot_store_integration(spark, sf_dir, tmp_path):
    """The production shape behind `cross_snapshot_dedup` (VERDICT r9 item
    6a pairs it with the S10/S11 txn layer), driven end-to-end: day 0's
    band signatures seed a versioned snapshot table; each later day PROBES
    the committed store for duplicates (the delta-only join), then lands
    its rows via the partition-pruned atomic MERGE. The incremental
    ledger must equal the one-pass query's, and the final store must
    equal the full band table — commit-by-commit dedup loses nothing."""
    from pyspark.sql import functions as F

    from profitscout_engine_spark.queries.similarity import (
        _SNAP_DAY_SPARK,
        N_SNAP_DAYS,
        _mh_bands,
    )
    from profitscout_engine_spark.sources import txn

    bd = (
        _mh_bands(spark, sf_dir)
        .withColumn("day", F.expr(_SNAP_DAY_SPARK))
        .select("doc_id", "band_id", "band_sig", "day")
    )
    root = str(tmp_path / "sigstore")
    txn.commit_snapshot(bd.where(F.col("day") == 0), root, partition_col="day")
    ledger = {}
    for day in range(1, N_SNAP_DAYS):
        store = txn.read_versioned(spark, root)
        delta = bd.where(F.col("day") == day)
        ledger[day] = (
            delta.join(
                store.select("band_id", "band_sig").distinct(),
                ["band_id", "band_sig"],
            )
            .select("doc_id")
            .distinct()
            .count()
        )
        # day is a pure function of doc_id and is in the keys, so the
        # partition-pruned commit path applies: only the new day's
        # partition is written, prior days hard-link through
        v = txn.merge_upsert_txn(
            spark, root, delta, keys=["doc_id", "band_id", "day"], partition_col="day"
        )
        assert v == day + 1  # one atomic snapshot per ingest day
    # the incremental ledger equals the one-pass query's dup column
    from profitscout_engine_spark.queries import load_registry

    out = (
        load_registry()["cross_snapshot_dedup"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("day")
    )
    for day, dups in ledger.items():
        assert out.loc[day, "n_dup_vs_store"] == dups, day
    # and the final store is the complete band table — dedup flags are
    # advisory, the signature ledger loses nothing
    final = txn.read_versioned(spark, root)
    assert final.count() == bd.count()
    assert final.exceptAll(bd).count() == 0 and bd.exceptAll(final).count() == 0


def test_crawl_budget_constraints_hold(spark, sf_dir):
    out = REGISTRY["crawl_budget_allocator"].fn(spark, sf_dir).toPandas()
    from profitscout_engine_spark.queries.textops import CRAWL_DAILY_TOKENS

    # the allocation never exceeds any of its three bounds
    assert (out["alloc_tokens"] <= out["fair_share"]).all()
    assert (out["alloc_tokens"] <= out["max_daily_tokens"]).all()
    assert (out["alloc_tokens"] <= out["tokens_kept"]).all()
    # fair shares never oversubscribe the global budget (floor division)
    assert out["fair_share"].sum() <= CRAWL_DAILY_TOKENS
    # bottleneck labels are consistent with the binding constraint
    corpus = out[out["bottleneck"] == "corpus"]
    assert (corpus["alloc_tokens"] == corpus["tokens_kept"]).all()
    polite = out[out["bottleneck"] == "politeness"]
    assert (polite["alloc_tokens"] == polite["max_daily_tokens"]).all()
    share = out[out["bottleneck"] == "share"]
    assert (share["alloc_tokens"] == share["fair_share"]).all()
    # only crawlable, non-empty domains get budget rows
    gate = REGISTRY["robots_policy_filter"].fn(spark, sf_dir).toPandas()
    crawlable = set(gate[gate["n_kept"] > 0]["domain"])
    assert set(out["domain"]) == crawlable
