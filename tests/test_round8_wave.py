"""Round-8 capability wave: Gram eigen-deflation, IVF rebuild audit,
incremental LPA over a graph delta."""

from __future__ import annotations

from pyspark.sql import functions as F

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.queries._util import t

REGISTRY = load_registry()


def test_gram_deflation_orthogonality_and_rayleigh(spark, sf_dir):
    """Two 64-component vectors on the +-1000 lattice; the deflated
    second component is near-orthogonal to the first; Rayleigh quotients
    are nonnegative (Gram is PSD) and ordered (component 1 dominates);
    component 1 is power-converged (w nearly parallel to v)."""
    import numpy as np

    out = REGISTRY["gram_topk_deflation"].fn(spark, sf_dir).toPandas()
    assert len(out) == 128
    comps = {}
    for c in (1, 2):
        sub = out[out["component"] == c].sort_values("pos")
        assert len(sub) == 64
        v = sub["v_val"].to_numpy(dtype=float)
        w = sub["w_val"].to_numpy(dtype=float)
        assert int(np.abs(v).max()) == 1000
        comps[c] = (v, w)
    v1, w1 = comps[1]
    v2, w2 = comps[2]
    cos12 = float(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert abs(cos12) < 0.2, f"deflation left components aligned: {cos12}"
    ray1 = float(np.dot(v1, w1) / np.dot(v1, v1))
    ray2 = float(np.dot(v2, w2) / np.dot(v2, v2))
    # PSD => nonnegative; dominance only up to near-degeneracy slack (the
    # fixture's top two eigenvalues sit within ~1% of each other, so a
    # 4-step power run can land either first)
    assert ray2 >= 0
    assert ray1 >= 0.9 * ray2
    cos1 = float(np.dot(v1, w1) / (np.linalg.norm(v1) * np.linalg.norm(w1)))
    assert cos1 > 0.95


def test_ivf_rebuild_audit_matches_parent_searches(spark, sf_dir):
    """Audit counts reconcile exactly with the old-index search results
    and obey the overlap bounds (n_common <= min(n_old, n_new) <= topk)."""
    from profitscout_engine_spark.queries.similarity import LSH_TOPK

    audit = REGISTRY["ivf_rebuild_audit"].fn(spark, sf_dir).toPandas()
    old = REGISTRY["ivf_search_topk"].fn(spark, sf_dir).toPandas()
    old_counts = old.groupby("a_id").size().to_dict()
    assert (audit["n_old"] <= LSH_TOPK).all()
    assert (audit["n_new"] <= LSH_TOPK).all()
    assert (audit["n_common"] <= audit[["n_old", "n_new"]].min(axis=1)).all()
    for _, r in audit.iterrows():
        assert r["n_old"] == old_counts.get(r["a_id"], 0)
    # every old-index query id appears in the audit
    assert set(old_counts) <= set(audit["a_id"])


def test_incremental_lpa_changes_stay_inside_the_delta_frontier(spark, sf_dir):
    """Every doc appears exactly once; isolated docs keep their own label
    unchanged; any node flagged changed lies within INC_LPA_ROUNDS hops
    of a delta edge (changes propagate one hop per round — the whole
    point of the frontier restriction)."""
    import hashlib

    from profitscout_engine_spark.queries.similarity import INC_LPA_ROUNDS

    out = REGISTRY["incremental_lpa_delta"].fn(spark, sf_dir).toPandas()
    n_docs = t(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert out["doc_id"].is_unique

    pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, sf_dir).select("d1", "d2").collect()
    adj: dict[int, set[int]] = {}
    frontier: set[int] = set()
    for r in pairs:
        d1, d2 = r["d1"], r["d2"]
        adj.setdefault(d1, set()).add(d2)
        adj.setdefault(d2, set()).add(d1)
        nib = hashlib.md5(f"{d1}|{d2}".encode()).hexdigest()[0]
        if nib in "0123":
            frontier |= {d1, d2}
    reach = set(frontier)
    for _ in range(INC_LPA_ROUNDS - 1):
        reach |= {n for v in reach for n in adj.get(v, ())}
    changed = set(out[out["changed"]]["doc_id"])
    assert changed <= reach, f"changes escaped the frontier: {sorted(changed - reach)[:5]}"
    # isolated docs are their own fixed point
    iso = out[~out["doc_id"].isin(adj.keys())]
    assert (iso["community"] == iso["doc_id"]).all()
    assert (~iso["changed"]).all()
