"""Round-11 capability wave (VERDICT r10 item 5a/5b): incremental IVF
maintenance on the committed snapshot store, and cross-snapshot SEMANTIC
dedup against a committed embedding-LSH bucket store. Both get (a)
ledger-invariant checks and (b) the end-to-end txn-store integration the
r10 cross-snapshot MinHash ledger set the pattern for."""

from __future__ import annotations

from pyspark.sql import functions as F

from profitscout_engine_spark.queries import load_registry

REGISTRY = load_registry()


def test_ivf_incremental_ledger_invariants(spark, sf_dir):
    from profitscout_engine_spark.queries.similarity import (
        KM_TRAIN_K,
        N_SNAP_DAYS,
        RETRAIN_DRIFT,
    )
    from profitscout_engine_spark.queries._util import t

    out = REGISTRY["ivf_incremental_maintain"].fn(spark, sf_dir).toPandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["day"]) == list(range(N_SNAP_DAYS))
    # day 0 is the training day: its mean assignment distance IS the
    # baseline, so its drift ratio is exactly 1 and never flags
    assert out.loc[0, "drift_ratio"] == 1.0
    assert not out.loc[0, "retrain_flag"]
    # the flag is a pure function of the ratio
    assert (out["retrain_flag"] == (out["drift_ratio"] > RETRAIN_DRIFT)).all()
    # every vector is ingested exactly once across the days
    assert out["n_ingested"].sum() == t(spark, sf_dir, "embeddings").count()
    # a day cannot touch more lists than the quantizer has
    assert (out["n_lists_used"] <= KM_TRAIN_K).all()
    assert (out["n_lists_used"] >= 1).all()
    assert (out["sum_dist_milli"] >= 0).all()


def test_ivf_incremental_store_integration(spark, sf_dir, tmp_path):
    """The production cadence behind `ivf_incremental_maintain`, driven
    end-to-end on the txn layer: day 0 trains on its bounded sample and
    COMMITS the centroids as a versioned snapshot table; every later day
    reads the committed copy back and assigns against it (never against
    in-process state); the drift trigger answers with a retrain COMMIT
    that advances the table version. The incremental ledger must equal
    the one-pass query's rows."""
    from profitscout_engine_spark.queries.similarity import (
        KM_SAMPLE_N,
        N_SNAP_DAYS,
        _VSNAP_DAY_SPARK,
        _km_argmin,
        _km_lattice_vecs,
        _km_lloyd_loop,
    )
    from profitscout_engine_spark.sources import txn

    vecs = _km_lattice_vecs(spark, sf_dir).withColumn(
        "day", F.expr(_VSNAP_DAY_SPARK)
    )
    d0_sample = (
        vecs.where(F.col("day") == 0)
        .orderBy(
            F.md5(F.concat(F.lit("kmsamp|"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(KM_SAMPLE_N)
        .select("vec_id", "v")
    )
    cent = _km_lloyd_loop(d0_sample)
    assert cent is not None

    root = str(tmp_path / "centroid_store")
    cent_df = spark.createDataFrame(
        [(cid, v) for cid, v in sorted(cent.items())], "cid int, v array<bigint>"
    )
    assert txn.commit_snapshot(cent_df, root) == 1

    # ledger rebuilt day by day against the COMMITTED centroids
    committed = {
        r["cid"]: list(r["v"]) for r in txn.read_versioned(spark, root).collect()
    }
    assert committed == cent
    ledger = {}
    for day in range(N_SNAP_DAYS):
        s = _km_argmin(committed)
        row = (
            vecs.where(F.col("day") == day)
            .select(s["cid"].alias("cid"), s["dist"].alias("dist"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.expr("dist div 1000000")).alias("sd"),
                F.countDistinct("cid").alias("nl"),
            )
            .collect()[0]
        )
        ledger[day] = (row["n"], row["sd"], row["nl"])

    out = (
        REGISTRY["ivf_incremental_maintain"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("day")
    )
    for day, (n, sd, nl) in ledger.items():
        assert out.loc[day, "n_ingested"] == n, day
        assert out.loc[day, "sum_dist_milli"] == sd, day
        assert out.loc[day, "n_lists_used"] == nl, day

    # the drift trigger's answer: a retrain recommit advances the version
    # and later readers see the NEW quantizer (exercised unconditionally —
    # at fixture scale the flag may never raise)
    last_day_sample = (
        vecs.where(F.col("day") == N_SNAP_DAYS - 1)
        .orderBy(
            F.md5(F.concat(F.lit("kmsamp|"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(KM_SAMPLE_N)
        .select("vec_id", "v")
    )
    cent2 = _km_lloyd_loop(last_day_sample)
    cent2_df = spark.createDataFrame(
        [(cid, v) for cid, v in sorted(cent2.items())], "cid int, v array<bigint>"
    )
    assert txn.commit_snapshot(cent2_df, root, expected_version=1) == 2
    assert txn.current_version(root) == 2
    readback = {
        r["cid"]: list(r["v"]) for r in txn.read_versioned(spark, root).collect()
    }
    assert readback == cent2
    # time travel still serves the original quantizer for reproducibility
    v1 = {
        r["cid"]: list(r["v"])
        for r in txn.read_versioned(spark, root, version=1).collect()
    }
    assert v1 == cent


def test_quality_calibration_drift_invariants(spark, sf_dir):
    from profitscout_engine_spark.queries._util import t
    from profitscout_engine_spark.queries.curation import (
        QC_DRIFT_PSI,
        QC_SNAP_DAYS,
    )

    out = REGISTRY["quality_calibration_drift"].fn(spark, sf_dir).toPandas()
    n_sources = (
        t(spark, sf_dir, "documents").select("source").distinct().count()
    )
    # dense ledger: every (source, day) cell reported exactly once
    assert len(out) == n_sources * QC_SNAP_DAYS
    # day 0 scores exactly 0 against itself and never flags
    d0 = out[out["day"] == 0]
    assert (d0["psi"] == 0.0).all()
    assert (~d0["drifted"]).all()
    assert (d0["n_docs"] == d0["n_base_docs"]).all()
    # the flag is a pure function of the reported PSI
    assert (out["drifted"] == (out["psi"] > QC_DRIFT_PSI)).all()
    # every document lands in exactly one (source, day) cell
    assert out["n_docs"].sum() == t(spark, sf_dir, "documents").count()
    # PSI is symmetric-positive: nonzero only when distributions differ
    assert (out["psi"] >= 0.0).all()


def test_quality_calibration_baseline_store_integration(spark, sf_dir, tmp_path):
    """The production cadence behind `quality_calibration_drift`: day 0's
    per-source score histogram is COMMITTED as the versioned baseline
    table; each later day computes only its own histogram, reads the
    committed baseline back, and evaluates PSI against the stored copy —
    the per-(source, day) PSI must equal the one-pass query's ledger."""
    import math

    from pyspark.sql import functions as F

    from profitscout_engine_spark.queries.curation import (
        _QC_BIN,
        _QSNAP_DAY_SPARK,
        QC_PSI_BINS,
        QC_SNAP_DAYS,
        _qc_scored,
    )
    from profitscout_engine_spark.sources import txn

    b = _qc_scored(spark, sf_dir, "source").select(
        "source",
        F.expr(_QSNAP_DAY_SPARK).alias("day"),
        F.expr(_QC_BIN.format(div="div")).cast("long").alias("bin"),
    )

    def day_hist(day: int):
        """Dense add-one-smoothed per-source histogram for one day."""
        rows = (
            b.where(F.col("day") == day)
            .groupBy("source", "bin")
            .count()
            .collect()
        )
        hist: dict[str, list[int]] = {}
        for r in rows:
            hist.setdefault(r["source"], [1] * QC_PSI_BINS)[r["bin"]] += r[
                "count"
            ]
        return hist

    sources = [r["source"] for r in b.select("source").distinct().collect()]
    base = day_hist(0)
    root = str(tmp_path / "baseline_store")
    base_df = spark.createDataFrame(
        [(s, base.get(s, [1] * QC_PSI_BINS)) for s in sources],
        "source string, hist array<bigint>",
    )
    assert txn.commit_snapshot(base_df, root) == 1

    committed = {
        r["source"]: list(r["hist"])
        for r in txn.read_versioned(spark, root).collect()
    }

    def psi(ca: list[int], cb: list[int]) -> float:
        na, nb = sum(ca), sum(cb)
        nano = 0
        for a, bb in zip(ca, cb):
            p, q = a / na, bb / nb
            nano += math.floor((p - q) * math.log(p / q) * 1_000_000_000 + 0.5)
        return round(nano / 1.0e9, 6)

    out = (
        REGISTRY["quality_calibration_drift"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index(["source", "day"])
    )
    for day in range(QC_SNAP_DAYS):
        cur = day_hist(day)
        for s in sources:
            expect = psi(
                cur.get(s, [1] * QC_PSI_BINS), committed[s]
            )
            assert out.loc[(s, day), "psi"] == expect, (s, day)


def test_cross_snapshot_semantic_ledger_telescopes(spark, sf_dir):
    from profitscout_engine_spark.operators import similarity as sim
    from profitscout_engine_spark.queries.similarity import N_SNAP_DAYS, _vecs

    out = REGISTRY["cross_snapshot_semantic_dedup"].fn(spark, sf_dir).toPandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["day"]) == list(range(N_SNAP_DAYS))
    # day 0 probes an empty store
    assert out.loc[0, "n_candidates"] == 0
    assert out.loc[0, "n_dup_vs_store"] == 0
    assert out.loc[0, "dup_frac"] == 0.0
    # per-day accounting telescopes
    assert (out["n_novel"] + out["n_dup_vs_store"] == out["n_ingested"]).all()
    # verified dups are a subset of bucket candidates
    assert (out["n_dup_vs_store"] <= out["n_candidates"]).all()
    e = _vecs(spark, sf_dir).select("vec_id", "v")
    assert out["n_ingested"].sum() == e.count()
    # bucket cells are attributed exactly once across days
    n_cells = sim.lsh_buckets(e).select("table_id", "bucket").distinct().count()
    assert out["n_new_bucket_cells"].sum() == n_cells


def test_cross_snapshot_contamination_ledger(spark, sf_dir):
    from pyspark.sql import functions as F

    from profitscout_engine_spark.queries._util import t
    from profitscout_engine_spark.queries.curation import QC_SNAP_DAYS

    out = REGISTRY["cross_snapshot_contamination"].fn(spark, sf_dir).toPandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["day"]) == list(range(QC_SNAP_DAYS))
    # per-day accounting telescopes
    assert (out["n_clean"] + out["n_contaminated"] == out["n_train_ingested"]).all()
    # every train doc ingested exactly once across days
    d = t(spark, sf_dir, "documents").select(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias("h")
    )
    n_train = d.where(~F.col("h").isin("e", "f")).count()
    assert out["n_train_ingested"].sum() == n_train
    # a contaminated doc carries at least CONTAM_NGRAM_MIN hits
    from profitscout_engine_spark.queries.curation import CONTAM_NGRAM_MIN

    assert (
        out["n_shared_hits"] >= out["n_contaminated"] * CONTAM_NGRAM_MIN
    ).all()
    # the ledger aggregates contamination_check exactly (same split contract)
    chk = REGISTRY["contamination_check"].fn(spark, sf_dir).toPandas()
    assert out["n_contaminated"].sum() == int(chk["contaminated"].sum())
    assert out["n_shared_hits"].sum() == int(chk["n_shared_ngrams"].sum())


def test_contamination_benchmark_store_integration(spark, sf_dir, tmp_path):
    """The committed benchmark store behind `cross_snapshot_contamination`:
    the test split's distinct shingles land ONCE in a versioned snapshot
    table when the eval suite freezes; each ingest day probes only its own
    train shingles against the committed copy. The per-day counts must
    equal the one-pass ledger's."""
    from pyspark.sql import functions as F

    from profitscout_engine_spark.queries.curation import (
        _QSNAP_DAY_SPARK,
        CONTAM_NGRAM_MIN,
        QC_SNAP_DAYS,
    )
    from profitscout_engine_spark.queries.similarity import _sh_distinct
    from profitscout_engine_spark.sources import txn

    digit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    sh = _sh_distinct(spark, sf_dir).withColumn("is_test", digit.isin("e", "f"))
    root = str(tmp_path / "benchmark_store")
    txn.commit_snapshot(
        sh.where(F.col("is_test")).select("shingle").distinct(), root
    )

    store = txn.read_versioned(spark, root)
    train_sh = sh.where(~F.col("is_test")).withColumn(
        "day", F.expr(_QSNAP_DAY_SPARK)
    )
    out = (
        REGISTRY["cross_snapshot_contamination"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("day")
    )
    for day in range(QC_SNAP_DAYS):
        probe = (
            train_sh.where(F.col("day") == day)
            .join(store, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared"))
        )
        agg = probe.agg(
            F.sum("n_shared").alias("hits"),
            F.sum(
                F.when(F.col("n_shared") >= CONTAM_NGRAM_MIN, 1).otherwise(0)
            ).alias("contam"),
        ).collect()[0]
        assert out.loc[day, "n_shared_hits"] == (agg["hits"] or 0), day
        assert out.loc[day, "n_contaminated"] == (agg["contam"] or 0), day


def test_vocab_drift_invariants_and_committed_vocab(spark, sf_dir, tmp_path):
    """Ledger invariants plus the committed-vocabulary cadence: day 0's
    distinct terms commit to a versioned snapshot; later days' OOV counts
    against the COMMITTED copy equal the one-pass query's."""
    from pyspark.sql import functions as F

    from profitscout_engine_spark.queries.curation import (
        _QSNAP_DAY_SPARK,
        OOV_RETOKENIZE,
        QC_SNAP_DAYS,
        _term_tokens,
    )
    from profitscout_engine_spark.sources import txn

    out = REGISTRY["vocab_coverage_drift"].fn(spark, sf_dir).toPandas()
    out = out.sort_values("day").reset_index(drop=True)
    assert list(out["day"]) == list(range(QC_SNAP_DAYS))
    # day 0 defines the vocabulary: zero OOV by construction
    assert out.loc[0, "n_oov_tokens"] == 0
    assert out.loc[0, "n_new_terms"] == 0
    assert not out.loc[0, "retokenize_flag"]
    assert (out["n_oov_tokens"] <= out["n_tokens"]).all()
    assert (out["n_new_terms"] <= out["n_oov_tokens"]).all()
    assert (out["retokenize_flag"] == (out["oov_frac"] > OOV_RETOKENIZE)).all()
    tkd = _term_tokens(spark, sf_dir).select(
        "term", F.expr(_QSNAP_DAY_SPARK).alias("day")
    )
    assert out["n_tokens"].sum() == tkd.count()

    # committed-vocabulary replay
    root = str(tmp_path / "vocab_store")
    txn.commit_snapshot(
        tkd.where(F.col("day") == 0).select("term").distinct(), root
    )
    vocab = txn.read_versioned(spark, root)
    for day in range(1, QC_SNAP_DAYS):
        oov = (
            tkd.where(F.col("day") == day)
            .join(vocab, "term", "left_anti")
            .agg(
                F.count("*").alias("mass"),
                F.countDistinct("term").alias("terms"),
            )
            .collect()[0]
        )
        assert out.set_index("day").loc[day, "n_oov_tokens"] == oov["mass"], day
        assert out.set_index("day").loc[day, "n_new_terms"] == oov["terms"], day


def test_cross_snapshot_semantic_store_integration(spark, sf_dir, tmp_path):
    """The production shape behind `cross_snapshot_semantic_dedup`: the
    committed store is the (table_id, bucket) cell dim with first-seen
    day and representative; each day's vectors PROBE the committed store
    (candidates = bucket hits), then the day's genuinely-new cells land
    via the partition-pruned insert (anti-join makes it insert-only, so
    first-seen metadata is immutable by construction). The incremental
    candidate/new-cell counts must equal the one-pass query's ledger."""
    from profitscout_engine_spark.operators import similarity as sim
    from profitscout_engine_spark.queries.similarity import (
        N_SNAP_DAYS,
        _VSNAP_DAY_SPARK,
        _vecs,
    )
    from profitscout_engine_spark.sources import txn

    e = _vecs(spark, sf_dir).select("vec_id", "v")
    snap = _vecs(spark, sf_dir).select(
        "vec_id", F.expr(_VSNAP_DAY_SPARK).alias("day")
    )
    bd = sim.lsh_buckets(e).join(snap, "vec_id")

    def day_cells(day: int):
        return (
            bd.where(F.col("day") == day)
            .groupBy("table_id", "bucket")
            .agg(
                F.lit(day).cast("bigint").alias("first_day"),
                F.min("vec_id").alias("rep_id"),
            )
        )

    root = str(tmp_path / "bucket_store")
    txn.commit_snapshot(day_cells(0), root, partition_col="first_day")
    candidates = {0: 0}
    new_cells = {0: txn.read_versioned(spark, root).count()}
    for day in range(1, N_SNAP_DAYS):
        store = txn.read_versioned(spark, root)
        arriving = bd.where(F.col("day") == day)
        candidates[day] = (
            arriving.join(
                store.select("table_id", "bucket"), ["table_id", "bucket"]
            )
            .select("vec_id")
            .distinct()
            .count()
        )
        fresh = day_cells(day).join(
            store.select("table_id", "bucket"),
            ["table_id", "bucket"],
            "left_anti",
        )
        new_cells[day] = fresh.count()
        # insert-only merge: fresh cells cannot collide with stored keys,
        # and first_day is in the keys, so only the new day's partition
        # is written — prior days hard-link through
        v = txn.merge_upsert_txn(
            spark,
            root,
            fresh,
            keys=["table_id", "bucket", "first_day"],
            partition_col="first_day",
        )
        assert v == day + 1

    out = (
        REGISTRY["cross_snapshot_semantic_dedup"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("day")
    )
    for day in range(N_SNAP_DAYS):
        assert out.loc[day, "n_candidates"] == candidates[day], day
        assert out.loc[day, "n_new_bucket_cells"] == new_cells[day], day
    # the final store is the complete cell dim: every cell exactly once,
    # stamped with its true first-seen day
    final = txn.read_versioned(spark, root)
    truth = bd.groupBy("table_id", "bucket").agg(
        F.min("day").alias("first_day")
    )
    assert final.count() == truth.count()
    assert (
        final.select("table_id", "bucket", "first_day")
        .exceptAll(truth)
        .count()
        == 0
    )


def test_tombstone_purge_store_integration(spark, sf_dir, tmp_path):
    """The actual purge behind `tombstone_propagation_audit`: the MinHash
    band store commits to the txn layer, `delete_where_txn` removes the
    tombstoned docs' rows in one atomic snapshot flip, and the planner's
    numbers must match reality — exactly n_rows_purged rows vanish, the
    distinct-cell dim shrinks by exactly n_keys_orphaned, and time travel
    still serves the pre-purge snapshot (vacuum is the true erasure)."""
    from pyspark.sql import functions as F

    from profitscout_engine_spark.queries.similarity import (
        _TOMB_SPARK,
        _mh_bands,
    )
    from profitscout_engine_spark.sources import txn

    bands = _mh_bands(spark, sf_dir)
    root = str(tmp_path / "band_store")
    txn.commit_snapshot(bands, root)

    out = (
        REGISTRY["tombstone_propagation_audit"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("store")
    )
    pre_rows = bands.count()
    pre_cells = bands.select("band_id", "band_sig").distinct().count()
    assert out.loc["minhash_bands", "n_keys_total"] == pre_cells

    assert txn.delete_where_txn(spark, root, F.expr(_TOMB_SPARK)) == 2
    post = txn.read_versioned(spark, root)
    assert pre_rows - post.count() == out.loc["minhash_bands", "n_rows_purged"]
    post_cells = post.select("band_id", "band_sig").distinct().count()
    assert (
        pre_cells - post_cells == out.loc["minhash_bands", "n_keys_orphaned"]
    )
    # no under-delete: nothing tombstoned survives the purge
    assert post.where(F.expr(_TOMB_SPARK)).count() == 0
    # prior snapshot intact until vacuum — the documented retention story
    assert txn.read_versioned(spark, root, version=1).count() == pre_rows


def test_lsh_skew_audit_forecasts_the_banded_join(spark, sf_dir):
    """The audit's pair_mass is the banded join's exact output forecast:
    sum over cells of n*(n-1)/2 equals the total shared-band count that
    `minhash_lsh_pairs` actually produces — the planner predicts the join
    before paying for it."""
    out = REGISTRY["lsh_cell_skew_audit"].fn(spark, sf_dir).toPandas()
    pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).toPandas()
    assert out["pair_mass"].sum() == int(pairs["n_shared_bands"].sum())
    # bucket arithmetic: every cell in bucket p has 2^p <= n < 2^(p+1)
    assert (out["max_cell"] < 2 ** (out["occ_pow"] + 1)).all()
    assert (out["max_cell"] >= 2 ** out["occ_pow"]).all()
    # row mass telescopes to the full band store
    from profitscout_engine_spark.queries.similarity import _mh_bands

    assert out["n_rows"].sum() == _mh_bands(spark, sf_dir).count()
