"""Property tests for the curation operators, beyond the oracle equality in
test_correctness: structural invariants that must hold for ANY corpus
(coverage, monotonicity, exact reassembly), checked engine-side at sf0.001.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries.curation import (
    CHUNK_TOKENS,
    CONTAM_NGRAM_MIN,
    PACK_BUDGET,
    RP_DIM,
    VOCAB_TOPK,
    _rp_sign,
)

REGISTRY = load_registry()


def _run(name, spark, sf_dir) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def _docs_pd(sf_dir) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_chunk_split_covers_every_token(spark, sf_dir):
    """Chunks tile each document exactly: counts, lengths, and the chunk-0
    hash recomputed from the raw text."""
    out = _run("chunk_split", spark, sf_dir)
    docs = _docs_pd(sf_dir)
    docs["ntok"] = docs["text"].str.split(" ").str.len()

    g = out.groupby("doc_id").agg(
        n_chunks=("chunk_id", "count"),
        max_chunk=("chunk_id", "max"),
        tok_sum=("chunk_len", "sum"),
        len_max=("chunk_len", "max"),
        len_min=("chunk_len", "min"),
    )
    m = docs.set_index("doc_id").join(g)
    assert (m["n_chunks"] == -(-m["ntok"] // CHUNK_TOKENS)).all()
    assert (m["max_chunk"] == m["n_chunks"] - 1).all()
    assert (m["tok_sum"] == m["ntok"]).all()  # exact tiling, no gap/overlap
    assert (m["len_max"] <= CHUNK_TOKENS).all() and (m["len_min"] >= 1).all()

    # Chunk 0 content hash matches a straight recompute from the text.
    c0 = out[out["chunk_id"] == 0].set_index("doc_id")["chunk_hash"]
    for doc_id, text in docs.head(25)[["doc_id", "text"]].itertuples(index=False):
        want = hashlib.md5(" ".join(text.split(" ")[:CHUNK_TOKENS]).encode()).hexdigest()
        assert c0[doc_id] == want


def test_seq_packing_bins_are_ordered_and_cover(spark, sf_dir):
    out = _run("seq_packing", spark, sf_dir)
    docs = _docs_pd(sf_dir)
    docs["ntok"] = docs["text"].str.split(" ").str.len()

    assert out["n_docs"].sum() == len(docs)
    assert out["bin_tokens"].sum() == docs["ntok"].sum()
    for (_lang, _shard), grp in out.groupby(["lang", "shard_id"]):
        grp = grp.sort_values("bin_id").reset_index(drop=True)
        # contiguous bin ids from 0, and doc-id ranges strictly ordered
        assert (grp["bin_id"] == np.arange(len(grp))).all()
        assert (grp["last_doc"].values[:-1] < grp["first_doc"].values[1:]).all()
        # greedy exclusive-prefix rule: every bin but the last crosses the
        # budget boundary once its last doc is added
        cum = grp["bin_tokens"].cumsum()
        assert (cum.values[:-1] >= (grp["bin_id"].values[:-1] + 1) * PACK_BUDGET).all()


def test_contamination_excludes_test_split_and_thresholds(spark, sf_dir):
    out = _run("contamination_check", spark, sf_dir)
    is_test = out["doc_id"].astype(str).map(
        lambda s: hashlib.md5(s.encode()).hexdigest()[0] in ("e", "f")
    )
    assert not is_test.any()  # only train docs in the report
    assert (out["contaminated"] == (out["n_shared_ngrams"] >= CONTAM_NGRAM_MIN)).all()


def test_domain_mix_keeps_exactly_floor_per_source(spark, sf_dir):
    out = _run("domain_mix_rebalance", spark, sf_dir)
    counts = out.groupby("source")["doc_id"].count()
    floor = counts.min()
    kept = out[out["kept"]].groupby("source")["doc_id"].count()
    assert (kept == floor).all()  # every source downsampled to the rarest


def test_random_projection_matches_numpy(spark, sf_dir):
    out = _run("random_projection", spark, sf_dir)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").head(10)
    got = out.set_index(["vec_id", "dim"])["proj"]
    for vec_id, v in emb[["vec_id", "embedding"]].itertuples(index=False):
        v = np.asarray(v, dtype=np.float64)
        for k in range(RP_DIM):
            signs = np.array([_rp_sign(k, j) for j in range(len(v))], dtype=np.float64)
            # sequential left fold, matching the engine/oracle sum order
            acc = 0.0
            for x in v * signs:
                acc += x
            want = np.floor(acc * 1e6 + 0.5) / 1e6
            assert got[(vec_id, k)] == want


def test_pii_scrub_redaction_is_complete(spark, sf_dir):
    out = _run("pii_scrub", spark, sf_dir)
    assert (out["n_phone"] >= 1).all()  # synthesized contact line always hits
    phone = re.compile(r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}")
    longnum = re.compile(r"[0-9]{5,}")
    for red in out["redacted"].head(200):
        assert not phone.search(red) and not longnum.search(red)


def test_vocab_coverage_monotone(spark, sf_dir):
    out = _run("vocab_coverage", spark, sf_dir).sort_values("rank")
    k = min(VOCAB_TOPK, len(out))
    assert (out["rank"].values == np.arange(1, k + 1)).all()
    assert (np.diff(out["cum_share"].values) >= 0).all()
    assert out["cum_share"].iloc[-1] <= 1.0 + 1e-9
    assert (np.diff(out["cnt"].values) <= 0).all()  # sorted by frequency


def test_unigram_quality_bounds(spark, sf_dir):
    out = _run("unigram_freq_quality", spark, sf_dir)
    assert (out["n_rare"] <= out["n_tokens"]).all()
    assert (out["rare_frac"].between(0, 1)).all()
    assert (out["freq_ppm"] > 0).all()


def test_incremental_probe_invariants(spark, sf_dir):
    """Incoming-batch probe: covers exactly the incoming split, flags
    agree with match counts, and every reported match is corroborated by
    the symmetric MinHash pair set."""
    out = _run("incremental_dedup_probe", spark, sf_dir)
    side = out["doc_id"].astype(str).map(
        lambda s: hashlib.md5(s.encode()).hexdigest()[0] in ("c", "d")
    )
    assert side.all()  # only incoming docs reported
    assert (out["is_duplicate"] == (out["n_corpus_matches"] > 0)).all()
    assert (out.loc[out["is_duplicate"], "first_match"].notna()).all()
    # Corroborate against the full symmetric pair set: an (incoming,
    # corpus) band collision must appear there too.
    pairs = _run("minhash_lsh_pairs", spark, sf_dir)
    pairset = set(map(tuple, pairs[["d1", "d2"]].values))
    for doc, fm in out.loc[out["is_duplicate"], ["doc_id", "first_match"]].values:
        a, b = int(min(doc, fm)), int(max(doc, fm))
        assert (a, b) in pairset
