"""Round-4 additions: semantic/differential tests beyond the oracle gate.

- exact_substring_dedup: planted-duplicate corpus with hand-computed span
  coverage, plus structural invariants on the fixture.
- dim_truncation_recall: independent NumPy re-derivation of both rankings
  and the recall set intersection.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries.similarity import (
    SUBSTR_STRIDE,
    SUBSTR_W,
    TRUNC_DIM,
    TRUNC_K,
    TRUNC_QMOD,
)

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Three docs: 1 and 2 share an identical 100-char block (distinct
    elsewhere), 3 is unrelated. Only documents.parquet is needed."""
    dst = str(tmp_path_factory.mktemp("sf_planted"))
    block = "".join(chr(ord("a") + (i * 7) % 26) for i in range(100))
    d1 = "X" * 40 + block + "Y" * 40
    d2 = "P" * 25 + block + "Q" * 55
    d3 = "".join(chr(ord("A") + (i * 11) % 26) for i in range(180))
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM (VALUES
            (1::BIGINT, '{d1}', 'en', 'web', {len(d1)}::BIGINT),
            (2::BIGINT, '{d2}', 'en', 'web', {len(d2)}::BIGINT),
            (3::BIGINT, '{d3}', 'en', 'web', {len(d3)}::BIGINT)
        ) t(doc_id, text, lang, source, n_chars))
        TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return dst


def _py_substring_dedup(docs: dict[int, str]) -> dict[int, tuple[int, int, int, int]]:
    """Reference implementation: (n_shingles, n_dup_shingles, n_spans,
    dup_chars) per doc over the same sampled grid."""
    import hashlib

    w = SUBSTR_W
    sh: dict[int, list[tuple[int, str]]] = {}
    owners: dict[str, set[int]] = {}
    for did, text in docs.items():
        if len(text) < w:
            continue
        sh[did] = []
        for pos in range(1, len(text) - w + 2):
            h = hashlib.md5(text[pos - 1 : pos - 1 + w].encode()).hexdigest()
            if h[0] not in ("0", "8"):  # content-defined anchor selection
                continue
            sh[did].append((pos, h))
            owners.setdefault(h, set()).add(did)
    out = {}
    for did, entries in sh.items():
        dup = [(p, h) for p, h in entries if len(owners[h]) > 1]
        spans: list[list[int]] = []
        for p, _ in sorted(dup):
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + w)
            else:
                spans.append([p, p + w])
        out[did] = (
            len(entries),
            len(dup),
            len(spans),
            sum(e - s for s, e in spans),
        )
    return out


def test_substring_dedup_planted_block(spark, planted_dir):
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["exact_substring_dedup"]
        .fn(spark, planted_dir)
        .collect()
    }
    con = duckdb.connect()
    docs = dict(
        con.sql(f"SELECT doc_id, text FROM '{planted_dir}/documents.parquet'").fetchall()
    )
    con.close()
    ref = _py_substring_dedup(docs)
    assert set(rows) == set(ref)
    for did, (n_sh, n_dup, n_spans, dup_chars) in ref.items():
        r = rows[did]
        assert (r["n_shingles"], r["n_dup_shingles"], r["n_spans"], r["dup_chars"]) == (
            n_sh,
            n_dup,
            n_spans,
            dup_chars,
        ), did
    # the planted block must actually be detected in docs 1 and 2 only
    assert rows[1]["dup_chars"] > 0 and rows[2]["dup_chars"] > 0
    assert rows[3]["dup_chars"] == 0


def test_substring_dedup_fixture_invariants(spark, sf_dir):
    df = REGISTRY["exact_substring_dedup"].fn(spark, sf_dir).collect()
    assert len(df) > 0
    for r in df:
        assert 0 <= r["n_dup_shingles"] <= r["n_shingles"]
        assert r["n_spans"] <= r["n_dup_shingles"]
        # every merged island covers at least one full window
        assert r["dup_chars"] >= SUBSTR_W * r["n_spans"] or r["n_spans"] == 0
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_dim_truncation_recall_matches_numpy(spark, sf_dir):
    out = {
        r["q_id"]: r
        for r in REGISTRY["dim_truncation_recall"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    raw = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in raw])
    vecs = np.array([r[1] for r in raw], dtype=np.float64)

    def topk(mat: np.ndarray, qi: int) -> set[int]:
        q = mat[qi]
        sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        sims = np.floor(sims * 1e6 + 0.5) / 1e6  # the engines' stable 6dp round
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-sims[i], ids[i]),
        )
        return {int(ids[i]) for i in order[:TRUNC_K]}

    for qi in range(len(ids)):
        if ids[qi] % TRUNC_QMOD:
            continue
        full = topk(vecs, qi)
        trunc = topk(vecs[:, :TRUNC_DIM], qi)
        n = len(full & trunc)
        r = out[int(ids[qi])]
        assert r["n_overlap"] == n
        assert abs(r["recall_at_10"] - n / TRUNC_K) < 1e-9


def test_plsa_em_step_matches_python(spark, sf_dir):
    """Pure-Python replay of the EM step (same md5 init, same IEEE op
    order, same 1e-9 fixing) must reproduce the query bit-for-bit."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    import duckdb

    from profitscout_engine_spark.queries.curation import PLSA_B, PLSA_K

    def hx(c):
        return "0123456789abcdef".index(c)

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()

    counts = Counter()
    for did, text in docs:
        for tok in text.split(" "):
            if tok:
                h = md5("pl|" + tok)
                counts[(did, (16 * hx(h[0]) + hx(h[1])) % PLSA_B)] += 1

    phsum = {
        t: sum(1 + hx(md5(f"plph|{t}|{b}")[0]) for b in range(PLSA_B))
        for t in range(PLSA_K)
    }
    p = {
        (t, b): (1 + hx(md5(f"plph|{t}|{b}")[0])) * 1.0 / phsum[t]
        for t in range(PLSA_K)
        for b in range(PLSA_B)
    }
    s = defaultdict(lambda: [0, 0, 0])
    for (did, b), n in counts.items():
        th = [1 + hx(md5(f"plth|{did}|{t}")[0]) for t in range(PLSA_K)]
        thsum = th[0] + th[1] + th[2]
        num = [(th[t] * 1.0 / thsum) * p[(t, b)] for t in range(PLSA_K)]
        den = num[0] + num[1] + num[2]
        for t in range(PLSA_K):
            s[b][t] += n * int(math.floor(num[t] / den * 1e9 + 0.5))
    tot = [sum(s[b][t] for b in s) for t in range(PLSA_K)]

    from profitscout_engine_spark.queries import load_registry

    out = load_registry()["plsa_em_step"].fn(spark, sf_dir).collect()
    assert len(out) == len(s)
    for r in out:
        b = r["bucket"]
        for t in range(PLSA_K):
            ref = math.floor(s[b][t] * 1.0 / tot[t] * 1e6 + 0.5) / 1e6
            assert r[f"phi{t}_new"] == ref, (b, t)
    # each updated topic-term distribution sums to 1 (rounding slack)
    for t in range(PLSA_K):
        assert abs(sum(r[f"phi{t}_new"] for r in out) - 1.0) < 1e-3


def test_two_stage_rerank_invariants(spark, sf_dir):
    """Final survivors come from the stage-1 pool, exact ranks are dense
    and sims non-increasing per query; adc_rank is the stage-1 position."""
    from profitscout_engine_spark.queries.similarity import LSH_TOPK, RERANK_POOL

    rows = REGISTRY["two_stage_rerank"].fn(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["a_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= LSH_TOPK
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(1 <= r["adc_rank"] <= RERANK_POOL for r in rs)
