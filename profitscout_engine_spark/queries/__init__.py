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

# Round-10 window rotation (VERDICT r9 item 1). Composition, mechanically
# derived from DRIVER_STATE.json after `--stamp 9` (50 greens stamped,
# `--check` 0 problems):
#   1-16   the 16 rows whose basis is the r9 builder sweep restamp (their
#          plan shas migrated to the chunk-independent reset-shared capture
#          semantics; verified exact at sf0.01 + 2x, but a driver row is
#          stronger) — the restamp queue the r9 verdict asked to lead with;
#   17-21  queries edited THIS round (the two approx sketches gained bounds
#          oracles; corpus_curation_pipeline aux5 NULL-propagating concat;
#          smart_batching_waste helper signature; url_canonical_dedup parse
#          chain factored into _url_parsed_frame) — their r9 stamps go
#          stale the moment the edits land;
#   22-26  round-10 additions (cross-snapshot dedup ledger, robots/licence
#          policy gate, truncation-loss audit, bounded-sample k-means
#          trainer, crawl-budget allocator);
#   27-50  freshness re-rows: the 9 remaining r3-vintage driver greens,
#          then the 15 alphabetically-first r4-vintage ones.
# Everything rotated out was driver-green r1-r9 on unchanged code and stays
# pinned by tests/test_correctness.py + tests/test_driver_state.py.
_WINDOW_FRONT = (
    # -- sweep-basis only since the reset-shared plan-sha migration (r9) --
    "ann_recall_curve",
    "bigram_lm_logprob",
    "dbscan_core_points",
    "dedup_consensus",
    "incremental_dedup_probe",
    "ivfpq_search",
    "knn_label_eval",
    "label_propagation_rounds",
    "lsh_s_curve_audit",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "pagerank_iteration",
    "pagerank_power_lattice",
    "scanner_rank",
    "threshold_sweep_components",
    "triangle_count",
    # -- edited this round (stamps stale by construction) --
    "approx_distinct_sketch",
    "approx_quantile_sketch",
    "corpus_curation_pipeline",
    "smart_batching_waste",
    "url_canonical_dedup",
    # -- round-10 additions --
    "cross_snapshot_dedup",
    "robots_policy_filter",
    "packing_truncation_audit",
    "kmeans_sample_train",
    "crawl_budget_allocator",
    # -- freshness re-rows: the 9 remaining r3-vintage greens --
    "string_extract",
    "tier_tally",
    "token_stats_bpe",
    "top_n_per_group",
    "two_key_sort_limit",
    "unigram_freq_quality",
    "union_all_patterns",
    "value_counts_pct",
    "window_extrema",
    # -- freshness re-rows: the 15 alphabetically-first r4-vintage greens --
    "anti_join_dormant_customers",
    "beta_to_market",
    "bloom_semijoin_account",
    "click_attribution_stream",
    "column_entropy",
    "countmin_freq_portable",
    "cube_flag_status",
    "drawdown_stats",
    "frame_sample_stride",
    "gap_fill_ffill",
    "hll_distinct_portable",
    "hll_merge_incremental",
    "image_resize_nn",
    "incremental_agg_maintain",
    "interval_peak_load",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry, ordered
    so the driver's 50-query correctness window sees ``_WINDOW_FRONT`` first."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    front = {n: REGISTRY[n] for n in _WINDOW_FRONT if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
