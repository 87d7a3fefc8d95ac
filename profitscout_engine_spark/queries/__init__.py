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

# Round-9 window rotation (VERDICT r8 item 1 + ADVICE). Composition,
# mechanically derived from DRIVER_STATE.json after `--stamp 8` (50 greens
# stamped, `--check` 0 problems):
#   1-4    the 4 NEVER-driver-checked queries (added after the r8 window
#          froze; judge-r8 swept exact at sf0.01, so risk is low);
#   5-19   the 15 rows whose basis is the r8 builder sweep restamp (their
#          plan shas flipped under the RDD-id normalizer fix; a sweep
#          verified them, but a driver row is stronger);
#   20-21  queries edited THIS round (corpus_filter_pipeline source
#          refactor for the capstone; incremental_lpa_delta perf work) —
#          their r8 stamps go stale the moment the edits land;
#   22-29  round-9 additions (url canonicalization dedup, shard-aware
#          training shuffle, centroid drift monitor, curation capstone,
#          boilerplate lines, bitext margin mining, signature-store
#          maintenance, smart-batching waste);
#   30-50  the 21 alphabetically-first r3-vintage driver greens as
#          freshness re-rows. Per ADVICE r8, the 2 oracle-less sketch
#          queries are EXCLUDED from freshness selection (their driver
#          rows are rows-only `no_oracle` — a wasted hash-compare slot);
#          they were restamped r8 anyway. The 9 remaining r3-vintage rows
#          (string_extract, tier_tally, token_stats_bpe, top_n_per_group,
#          two_key_sort_limit, unigram_freq_quality, union_all_patterns,
#          value_counts_pct, window_extrema) rotate in next round.
# Everything rotated out was driver-green r1-r8 on unchanged code and stays
# pinned by tests/test_correctness.py + tests/test_driver_state.py.
_WINDOW_FRONT = (
    # -- never driver-checked (round-8 post-window additions) --
    "embedding_health_stats",
    "knn_graph_sparsify",
    "tokenizer_fertility",
    "two_hop_candidates",
    # -- sweep-basis only since the RDD-id plan-sha normalizer restamp --
    "benford_audit",
    "containment_pairs",
    "cosine_lsh_topk",
    "dedup_impact_report",
    "dedup_keep_best",
    "embedding_neardup_lsh",
    "enrichment_pipeline",
    "graph_modularity",
    "hard_negatives",
    "hybrid_rank_fusion",
    "k_core_peel",
    "pct_change_guarded",
    "prefix_filter_jaccard",
    "table_profile",
    "two_stage_rerank",
    # -- edited this round (stamps stale by construction) --
    "corpus_filter_pipeline",
    "incremental_lpa_delta",
    # -- round-9 additions --
    "url_canonical_dedup",
    "training_order_shuffle",
    "centroid_drift_monitor",
    "corpus_curation_pipeline",
    "boilerplate_lines",
    "bitext_margin_mining",
    "signature_store_maintenance",
    "smart_batching_waste",
    # -- freshness re-rows: the 21 alphabetically-first r3-vintage greens --
    "dedup_rank",
    "dim_enrichment_revenue",
    "distinct_pairs",
    "funnel_stages",
    "future_rows_top3",
    "histogram_buckets",
    "json_extraction",
    "latest_day_filter",
    "lead_returns",
    "max_losing_streak",
    "membership_semi",
    "multiway_join",
    "negated_conjunction",
    "null_guard_cast",
    "obv_cumulative",
    "pattern_combo_having",
    "pruned_scan",
    "regime_weighted_score",
    "rollup_totals",
    "seq_packing",
    "set_ops_intersect_except",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry, ordered
    so the driver's 50-query correctness window sees ``_WINDOW_FRONT`` first."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    front = {n: REGISTRY[n] for n in _WINDOW_FRONT if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
