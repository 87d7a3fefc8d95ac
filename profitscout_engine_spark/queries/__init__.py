"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL a DuckDB oracle runs on the same parquet tables.

Determinism rules (the driver compares order-insensitive value hashes, with
columns sorted by name):
- alias every computed column identically on both sides;
- round every float output on BOTH sides (engines agree on the double bits of
  the inputs, so rounded derived values agree too);
- break every top-k / rank tie with a unique key so LIMIT/ROW_NUMBER pick the
  same rows in both engines;
- sort arrays before exposing them (collect_list order is nondeterministic).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 operator ids


REGISTRY: dict[str, QuerySpec] = {}


def stabilize_round(sql: str) -> str:
    """Rewrite every ``ROUND(expr, n)`` in oracle SQL into the engine-stable
    ``FLOOR((expr) * 1eN + 0.5) / 1eN`` form (see exprs.stable_round for why:
    Spark and DuckDB ROUND disagree on half-boundary doubles). Lets oracle
    SQL stay readable while the executed text matches Spark's arithmetic.
    """
    out = []
    i = 0
    upper = sql.upper()
    while True:
        j = upper.find("ROUND(", i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        # Only a bare function name (not e.g. MY_ROUND()).
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i : j + 6])
            i = j + 6
            continue
        out.append(sql[i:j])
        depth, k = 1, j + 6
        top_comma = -1
        while k < len(sql) and depth:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                top_comma = k
            k += 1
        inner = sql[j + 6 : k - 1]
        if top_comma < 0:
            expr, n = inner, "0"
        else:
            expr, n = inner[: top_comma - (j + 6)], inner[top_comma - (j + 6) + 1 :].strip()
        out.append(f"FLOOR(({expr.strip()}) * 1e{n} + 0.5) / 1e{n}")
        i = k


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        stable = stabilize_round(oracle) if oracle is not None else None
        REGISTRY[name] = QuerySpec(fn=fn, oracle=stable, tags=tuple(tags))
        return fn

    return deco


# Registration order is a driver contract: the correctness harness verifies the
# FIRST 50 registered queries each round. Round 1 verified relational/aggregates/
# windows (+3 execution); round 2 rotated in the then-dark families (similarity,
# textops, curation, pipelines, timeseries, execution) — the union covers all 96.
_MODULES = (
    "similarity",
    "textops",
    "curation",
    "pipelines",
    "timeseries",
    "execution",
    "windows",
    "aggregates",
    "relational",
    "sketches",
    "finance",
    "maintenance",
    "tpch",
)

# Round-6 window rotation (VERDICT r5 plan): delete the 49 names that went
# HASH-GREEN in CORRECTNESS_r05 — NOT the mechanical first 50, because the one
# red row (sliding_window_rate, a comparator-parity tz defect fixed this round)
# must STAY in the window for driver re-verification. What remains is that red
# row + the 47 never-driver-checked backlog names (oldest first) = 48, plus
# the two round-6 additions in the free slots = 50: the ENTIRE backlog fits,
# so a green CORRECTNESS_r06 means every oracle-paired query in the registry
# is driver-verified. Everything rotated out was driver-green in r1-r5 and
# stays pinned by tests/test_correctness.py.
_WINDOW_FRONT = (
    "sliding_window_rate",
    "autocorrelation_acf",
    "threshold_sweep_components",
    "multi_touch_attribution",
    "seasonal_anomaly",
    "pq_encode",
    "ivfpq_search",
    "semantic_dedup",
    "quality_classifier_score",
    "k_core_peel",
    "dp_noisy_counts",
    "als_half_step",
    "chunk_overlap_split",
    "bigram_lm_logprob",
    "stream_dedup_bands",
    "spearman_rank_corr",
    "bootstrap_ci_poisson",
    "hard_negatives",
    "temperature_mix_sample",
    "bpe_merge_step",
    "svd_power_step",
    "lr_gradient_step",
    "nb_confusion",
    "pr_curve_binned",
    "tree_split_gain",
    "woe_iv_source",
    "stream_cusum_monitor",
    "kmv_intersect_users",
    "exact_substring_dedup",
    "dim_truncation_recall",
    "bounded_window_funnel",
    "stream_watermark_late_audit",
    "session_path_ngrams",
    "graph_modularity",
    "plsa_em_step",
    "stream_heavy_hitters_cms",
    "audio_window_rms",
    "two_stage_rerank",
    "dbscan_core_points",
    "ann_recall_curve",
    "lsh_s_curve_audit",
    "source_minhash_similarity",
    "sliding_distinct_users",
    "dedup_impact_report",
    "sweep_grid_full",
    "enrichment_news_rollup",
    "shard_manifest",
    "curriculum_stage_split",
    # round-6 additions: fill the window's 2 free slots (48 + 2 = 50)
    "systematic_resample",
    "conformal_calibration",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry, ordered
    so the driver's 50-query correctness window sees ``_WINDOW_FRONT`` first."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    front = {n: REGISTRY[n] for n in _WINDOW_FRONT if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
