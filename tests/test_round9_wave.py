"""Round-9 capability wave: URL canonicalization dedup, shard-aware
training shuffle, centroid drift monitor, and the corpus-curation
capstone's structural invariants (stage counts telescope, zero leakage,
pack-bin arithmetic)."""

from __future__ import annotations

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries._util import t

REGISTRY = load_registry()


def test_url_canonical_form_is_normalized(spark, sf_dir):
    out = REGISTRY["url_canonical_dedup"].fn(spark, sf_dir).toPandas()
    assert len(out) == t(spark, sf_dir, "documents").count()
    c = out["canonical_url"]
    assert c.str.startswith("https://").all()  # scheme lowercased
    assert (~c.str.contains("www.", regex=False)).all()
    assert (~c.str.contains(":443", regex=False)).all()
    assert (~c.str.contains("#", regex=False)).all()
    assert (~c.str.contains("utm_", regex=False)).all()
    assert (~c.str.endswith("/")).all()  # no root-only URLs in the fixture
    # surviving params are sorted: a=1 before b=2 wherever both survive
    q = c[c.str.contains("?", regex=False)].str.split("?").str[1]
    assert (q == "a=1&b=2").all()
    # host case folded: domains come only from the lowercased sources
    assert out["domain"].str.islower().all()


def test_url_dedup_keeps_exactly_one_per_group(spark, sf_dir):
    out = REGISTRY["url_canonical_dedup"].fn(spark, sf_dir).toPandas()
    g = out.groupby("canonical_url")
    assert (g["is_kept"].sum() == 1).all()
    assert (g["doc_id"].transform("size") == out.set_index(
        out.index)["group_size"]).all()
    kept = out[out["is_kept"]]
    assert (kept.groupby("canonical_url")["doc_id"].first()
            == out.groupby("canonical_url")["doc_id"].min()).all()


def test_training_shuffle_is_a_permutation(spark, sf_dir):
    out = REGISTRY["training_order_shuffle"].fn(spark, sf_dir).toPandas()
    n = t(spark, sf_dir, "documents").count()
    assert len(out) == n and out["doc_id"].nunique() == n
    assert out["shard_id"].between(0, 15).all()
    # within each shard: positions are exactly 1..shard_size
    for sid, sub in out.groupby("shard_id"):
        assert sorted(sub["pos"]) == list(range(1, len(sub) + 1))
        assert (sub["shard_size"] == len(sub)).all()
    # interleaved consumption order is collision-free
    assert out["global_step"].nunique() == n
    # salted md5 keys spread shards roughly uniformly (no empty shard at
    # fixture scale, max/min within a loose band)
    sizes = out.groupby("shard_id").size()
    assert len(sizes) == 16 and sizes.min() >= 1


def test_centroid_drift_accounting(spark, sf_dir):
    out = REGISTRY["centroid_drift_monitor"].fn(spark, sf_dir).toPandas()
    n_vec = t(spark, sf_dir, "embeddings").count()
    assert out["n_old"].sum() + out["n_new"].sum() == n_vec
    assert (out["drift_pm"] == out["share_new_pm"] - out["share_old_pm"]).all()
    # floored per-mille shares: each era sums to (1000 - flooring loss)
    for col in ("share_old_pm", "share_new_pm"):
        assert 1000 - len(out) < out[col].sum() <= 1000
    assert (out["drifted"] == (out["drift_pm"].abs() > 30)).all()
    # assignment counts reconcile with the serving assignment query
    asg = REGISTRY["ivf_centroid_assign"].fn(spark, sf_dir).toPandas()
    per = asg.groupby("assigned_label").size()
    merged = out.set_index("centroid")
    assert ((merged["n_old"] + merged["n_new"]).sort_index()
            == per.sort_index()).all()


def test_curation_pipeline_stages_telescope(spark, sf_dir):
    from profitscout_engine_spark.queries.curation import PACK_BUDGET

    out = (
        REGISTRY["corpus_curation_pipeline"].fn(spark, sf_dir)
        .toPandas().sort_values("stage_id").reset_index(drop=True)
    )
    assert list(out["stage"]) == [
        "filter_gate", "near_dup", "train_split", "domain_mix", "seq_packing",
    ]
    # stage N's input is stage N-1's survivors; drops reconcile
    for i in range(1, 5):
        assert out.loc[i, "n_in"] == out.loc[i - 1, "n_kept"]
    assert (out["n_dropped"] == out["n_in"] - out["n_kept"]).all()
    # tokens shrink monotonically with the doc set
    assert (out["tokens_kept"].diff().dropna() <= 0).all()
    # structural leakage audit (stage 3 aux) is zero by construction
    assert out.loc[2, "aux"] == 0
    # stage 1 reconciles with the standalone gate
    gate = REGISTRY["corpus_filter_pipeline"].fn(spark, sf_dir).toPandas()
    assert out.loc[0, "n_in"] == len(gate)
    assert out.loc[0, "n_kept"] == int(gate["keep"].sum())
    # stage 4: every surviving source is cut to the same floor (aux4)
    floor = out.loc[3, "aux"]
    assert floor > 0 and out.loc[3, "n_kept"] % floor == 0
    # stage 5: bins can't beat perfect packing; each (lang, shard) group's
    # greedy bins never exceed docs
    n_bins = out.loc[4, "aux"]
    assert n_bins >= out.loc[4, "tokens_kept"] // PACK_BUDGET
    assert n_bins <= out.loc[4, "n_kept"]


def test_boilerplate_lines_accounting(spark, sf_dir):
    import pandas as pd

    out = REGISTRY["boilerplate_lines"].fn(spark, sf_dir).toPandas()
    docs = t(spark, sf_dir, "documents").toPandas()
    # every doc with >= 2 tokens reports; boiler counts bounded by lines
    assert (out["n_boiler"] <= out["n_lines"]).all()
    assert (out["n_lines"] >= 1).all()
    assert ((out["boiler_frac"] >= 0) & (out["boiler_frac"] <= 1)).all()
    with_lines = (docs["text"].str.split(" ").str.len() >= 2).sum()
    assert len(out) == with_lines
    # a flagged line is flagged for EVERY doc of its domain: recompute one
    # domain's boilerplate set in pandas and reconcile the counts
    src = out["source"].iloc[0]
    sub = docs[docs["source"] == src]
    lines = {}
    for _, r in sub.iterrows():
        tk = r["text"].split(" ")
        doc_lines = [" ".join(tk[2 * i:2 * i + 2]) for i in range(len(tk) // 2)]
        for ln in set(doc_lines):
            lines[ln] = lines.get(ln, 0) + 1
    n_docs = len(sub)
    boiler = {ln for ln, df in lines.items() if df >= 2 and df * 5 >= n_docs}
    for _, r in sub.iterrows():
        tk = r["text"].split(" ")
        doc_lines = [" ".join(tk[2 * i:2 * i + 2]) for i in range(len(tk) // 2)]
        expect = sum(1 for ln in doc_lines if ln in boiler)
        got = out[(out["doc_id"] == r["doc_id"])]["n_boiler"].iloc[0]
        assert got == expect, (r["doc_id"], got, expect)


def test_bitext_margin_properties(spark, sf_dir):
    from profitscout_engine_spark.queries.similarity import (
        BITEXT_MARGIN_MIN,
    )

    out = REGISTRY["bitext_margin_mining"].fn(spark, sf_dir).toPandas()
    # sides never mix: src even, tgt odd parity-crossed
    assert ((out["src_id"] % 2) == 0).all()
    assert ((out["tgt_id"] % 2) == 1).all()
    # one mined pair per source vector, margin above the floor,
    # positive cosine only
    assert out["src_id"].is_unique
    assert (out["margin"] >= BITEXT_MARGIN_MIN).all()
    assert (out["msim"] > 0).all()
    # hubness control: a target may serve several sources, but the mined
    # pair count is bounded by the source-side candidates
    assert len(out) <= (out["src_id"].nunique())


def test_signature_store_maintenance_accounting(spark, sf_dir):
    from profitscout_engine_spark.operators.text import MINHASH_BANDS

    out = REGISTRY["signature_store_maintenance"].fn(spark, sf_dir).toPandas()
    assert len(out) == MINHASH_BANDS
    assert (out["n_rewritten"] + out["n_unchanged"] == out["n_edited"]).all()
    # every band sees the SAME edited-doc population
    assert out["n_edited"].nunique() == 1
    # appending tokens can only add shingles: at least one band rewrites
    # at fixture scale
    assert out["n_rewritten"].sum() > 0


def test_smart_batching_never_loses(spark, sf_dir):
    out = REGISTRY["smart_batching_waste"].fn(spark, sf_dir).toPandas()
    # sorted batching never wastes more than arrival-order batching
    assert (out["sorted_waste"] <= out["naive_waste"]).all()
    assert (out["sorted_waste"] >= 0).all()
    # waste is bounded by (batch padding ceiling): cnt*max - sum < n_docs*max
    assert (out["naive_waste"] < out["n_tokens"] * 100).all()
    sr = out["saving_ratio"].dropna()
    assert ((sr >= 0) & (sr <= 1)).all()
