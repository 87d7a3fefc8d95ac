"""Property / differential tests for the PQ + IVF-PQ + SemDeDup wave and the
hashed-feature quality classifier (the oracle value-hash gate runs in
tests/test_correctness.py; these pin the cross-paradigm invariants)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from profitscout_engine_spark.queries.similarity import (
    PQ_K,
    PQ_M,
    PQ_S,
    SEMDEDUP_THETA,
    _pq_codes,
    ivfpq_search,
    pq_encode,
    semantic_dedup,
)
from profitscout_engine_spark.queries.curation import quality_classifier_score


def _np_pq(sf_dir: str):
    """NumPy reimplementation of the PQ contract: md5-sampled codebook,
    fixed-point sub-distances, argmin codes."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    ids = sorted(vecs)
    codebook = {}  # (m, k) -> subvector
    for m in range(PQ_M):
        ranked = sorted(ids, key=lambda i: (hashlib.md5(f"pq|{m}|{i}".encode()).hexdigest(), i))
        for k, vid in enumerate(ranked[:PQ_K]):
            codebook[(m, k)] = vecs[vid][m * PQ_S : (m + 1) * PQ_S]
    dfix = {}  # (vec, m, k) -> int 1e-6 units
    for vid in ids:
        for m in range(PQ_M):
            sub = vecs[vid][m * PQ_S : (m + 1) * PQ_S]
            for k in range(PQ_K):
                d = 0.0
                for x, y in zip(sub, codebook[(m, k)]):  # sequential fold
                    d += (x - y) * (x - y)
                dfix[(vid, m, k)] = math.floor(d * 1e6 + 0.5)
    codes = {
        (vid, m): min(range(PQ_K), key=lambda k: (dfix[(vid, m, k)], k))
        for vid in ids
        for m in range(PQ_M)
    }
    return ids, dfix, codes


def test_pq_codes_match_numpy_reference(spark, sf_dir):
    ids, dfix, np_codes = _np_pq(sf_dir)
    got = _pq_codes(spark, sf_dir).toPandas()
    assert len(got) == len(ids) * PQ_M
    for r in got.itertuples():
        assert np_codes[(int(r.vec_id), int(r.m))] == int(r.k)
        assert dfix[(int(r.vec_id), int(r.m), int(r.k))] == int(r.dfix)


def test_pq_encode_shape_and_error(spark, sf_dir):
    out = pq_encode(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    assert len(out) == len(emb)
    assert (out.qerr >= 0).all()
    # every code string is PQ_M codes in [0, PQ_K)
    for s in out.code_str:
        parts = s.split("-")
        assert len(parts) == PQ_M
        assert all(0 <= int(p) < PQ_K for p in parts)


def test_ivfpq_adc_equals_quantized_distance(spark, sf_dir):
    """ADC distance must equal Σ_m ||q_sub − codeword(code_x[m])||² exactly
    (in fixed-point units) — the defining identity of asymmetric distance
    computation."""
    ids, dfix, np_codes = _np_pq(sf_dir)
    got = ivfpq_search(spark, sf_dir).toPandas()
    assert len(got) > 0
    for r in got.sample(min(len(got), 200), random_state=7).itertuples():
        a, b = int(r.a_id), int(r.b_id)
        sfix = sum(dfix[(a, m, np_codes[(b, m)])] for m in range(PQ_M))
        assert abs(r.adc_dist - math.floor(sfix / 1e6 * 1e4 + 0.5) / 1e4) < 1e-9


def test_semantic_dedup_invariants(spark, sf_dir):
    out = semantic_dedup(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # full per-vector verdict, one row each
    assert len(out) == len(emb)
    assert out.vec_id.is_unique
    # at least one keeper per cluster (the centroid-nearest vector has no
    # better-ranked mate, so it can never be dropped)
    per_cluster = out.groupby("cluster").kept.sum()
    assert (per_cluster >= 1).all()
    # threshold monotonicity: every dropped vector really has a cluster-mate
    # (kept or not) at sim >= theta — verified transitively by the oracle
    # hash gate; here pin the cheap direction: no drops → no pairs is absurd
    # on the fixture (near-dups are planted), so some drop must exist
    assert (~out.kept).sum() > 0
    assert SEMDEDUP_THETA <= 1.0


def test_quality_classifier_matches_python(spark, sf_dir):
    """Differential: md5 hashing trick + signed 16-bit weights recomputed in
    pure Python on a sample of docs."""
    out = quality_classifier_score(spark, sf_dir).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def weight(feat: str) -> int:
        bh = hashlib.md5(f"qc|{feat}".encode()).hexdigest()
        bucket = int(bh[:2], 16)
        wh = hashlib.md5(f"qcw|{bucket}".encode()).hexdigest()
        return int(wh[:4], 16) - 32768

    for r in docs.sample(min(len(docs), 50), random_state=11).itertuples():
        tk = r.text.split(" ")
        feats = tk + [f"{a}_{b}" for a, b in zip(tk, tk[1:])]
        wsum = sum(weight(f) for f in feats)
        row = out.loc[r.doc_id]
        assert int(row.n_feats) == len(feats)
        score = math.floor(wsum / (max(len(feats), 1) * 32768.0) * 1e6 + 0.5) / 1e6
        assert abs(row.score - score) < 1e-9
        assert bool(row.keep) == (wsum > 0)


def test_svd_power_step_matches_numpy(spark, sf_dir):
    from profitscout_engine_spark.queries.similarity import svd_power_step

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    A = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    x = np.array(
        [
            (int(hashlib.md5(f"sv|{j}".encode()).hexdigest()[:4], 16) - 32768) / 32768.0
            for j in range(1, 65)
        ]
    )
    # replicate the fixed-point protocol exactly
    s = np.array([math.floor(sum(row * x) * 1e6 + 0.5) for row in A], dtype=np.int64)
    nxt = {
        j + 1: sum(math.floor(A[i, j] * s[i] + 0.5) for i in range(len(A)))
        for j in range(64)
    }
    msp = math.floor(int((s.astype(object) ** 2).sum()) / 1e12 / len(A) * 1e4 + 0.5) / 1e4
    got = svd_power_step(spark, sf_dir).toPandas().set_index("dim")
    assert len(got) == 64
    for j in range(1, 65):
        want = math.floor(nxt[j] / 1e12 * 1e6 + 0.5) / 1e6
        assert abs(got.loc[j, "next_v"] - want) < 1e-9
        assert abs(got.loc[j, "mean_sq_projection"] - msp) < 1e-9


def test_lr_gradient_step_matches_python(spark, sf_dir):
    from collections import Counter, defaultdict

    from profitscout_engine_spark.queries.curation import lr_gradient_step

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    grads: dict[int, int] = defaultdict(int)
    ndocs: dict[int, int] = defaultdict(int)
    for r in docs.itertuples():
        counts = Counter(
            int(hashlib.md5(f"lr|{t}".encode()).hexdigest()[:2], 16)
            for t in r.text.split(" ")
        )
        z = sum(
            c
            * (int(hashlib.md5(f"lrw|{b}".encode()).hexdigest()[:4], 16) - 32768)
            / 524288.0
            for b, c in counts.items()
        )
        resid = 1.0 / (1.0 + math.exp(-z)) - (1.0 if r.lang == "en" else 0.0)
        for b, c in counts.items():
            grads[b] += math.floor(c * resid * 1e9 + 0.5)
            ndocs[b] += 1
    got = lr_gradient_step(spark, sf_dir).toPandas().set_index("bucket")
    assert len(got) == len(grads)
    for b, g in grads.items():
        want = math.floor(g / 1e9 * 1e6 + 0.5) / 1e6
        assert abs(got.loc[b, "grad"] - want) < 1e-9
        assert int(got.loc[b, "n_docs"]) == ndocs[b]
