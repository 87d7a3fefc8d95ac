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

# Round-8 window rotation (VERDICT r7 plan). Composition, mechanically
# derived from DRIVER_STATE.json (driver_state.py --check after the r7 stamp
# reported 0 problems, so staleness comes only from round-8 edits):
#   1-2    the ONLY two never-driver-checked queries (added after the r7
#          window froze; judge-r7 exact at sf0.01 + 2x);
#   3-4    the two queries whose last basis is a SWEEP restamp, not a driver
#          row (their oracles gained MATERIALIZED hints after their last
#          driver row — a sweep verified them, but a driver row is stronger);
#   5-6    queries edited THIS round (k-means exact-integer M-step rounding,
#          expectation_audit NULL-FK semantics) — their r7 stamps go stale
#          the moment the edits land, so they re-enter the window;
#   7-31   the 25 remaining r2-vintage greens (oldest) as freshness re-rows;
#   32-44  the 13 alphabetically-first r3-vintage greens;
#   45-50  round-8 additions appended at the tail as they are built.
# Everything rotated out was driver-green in r1-r7 on unchanged code and
# stays pinned by tests/test_correctness.py + tests/test_driver_state.py.
_WINDOW_FRONT = (
    # -- never driver-checked (round-7 post-window additions) --
    "community_top_terms",
    "late_interaction_maxsim",
    # -- sweep-basis only since their MATERIALIZED-CTE oracle fix --
    "dedup_consensus",
    "threshold_sweep_components",
    # -- edited this round (stamps stale by construction) --
    "kmeans_train_converged",
    "expectation_audit",
    # -- freshness re-rows: the remaining r2-vintage green rows --
    "ivf_search_nprobe",
    "ivf_search_topk",
    "lang_id_heuristic",
    "length_winsorize",
    "minhash_lsh_pairs",
    "multimodal_features",
    "neardup_components",
    "ngram_jaccard_pairs",
    "per_lang_sample",
    "pii_scrub",
    "random_projection",
    "repetition_metrics",
    "scanner_rank",
    "scenario_explode",
    "session_windows",
    "simhash_pairs",
    "sma_window",
    "stateful_user_totals",
    "text_quality",
    "tfidf_top_terms",
    "token_stats",
    "trading_day_offsets",
    "tumbling_window_agg",
    "vocab_coverage",
    "zscore_normalize",
    # -- freshness re-rows: oldest r3-vintage green rows --
    "approx_distinct_sketch",
    "approx_quantile_sketch",
    "argmin_nearest",
    "atr_true_range",
    "best_contract",
    "bollinger_bands",
    "bpe_pair_counts",
    "coalesce_fallback",
    "compound_gate",
    "conditional_aggregates",
    "contract_symbols",
    "date_arithmetic",
    "date_span_rates",
    # -- round-8 additions + the _gram_frame/_gram_matvec refactor consumer --
    "gram_power_iteration",
    "gram_topk_deflation",
    "ivf_rebuild_audit",
    "incremental_lpa_delta",
    "semantic_contamination_audit",
    "leakage_safe_split",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry, ordered
    so the driver's 50-query correctness window sees ``_WINDOW_FRONT`` first."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    front = {n: REGISTRY[n] for n in _WINDOW_FRONT if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
