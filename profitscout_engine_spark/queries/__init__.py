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

# Round-7 window rotation (VERDICT r6 plan — STALE-GREEN PRIORITY, not just
# the backlog). Composition, mechanically derived (tools/driver_state.py):
#   1-10   the 10 round-6 additions that have never had a driver row;
#   11-20  every query whose (function source + oracle) hash CHANGED between
#          the round-5 end commit and round-6 end but which was NOT in the
#          round-6 driver window (the 2x-sweep oracle fixes + tag-hygiene
#          edits — tag-only edits are included because the hash can't
#          distinguish them and re-verification is cheap);
#   21-25  consumers of the round-6 operators/ranks.py interpolation rewrite
#          whose own source did NOT change (the hash diff can't see operator
#          edits; DRIVER_STATE.json now mechanizes exactly this gap);
#   26-44  the oldest still-green rows (r2 vintage) for freshness re-rows;
#   45-50  round-7 additions appended at the tail as they are built.
# Everything rotated out was driver-green in r1-r6 on unchanged code and
# stays pinned by tests/test_correctness.py + tests/test_driver_state.py.
_WINDOW_FRONT = (
    # -- never driver-checked (round-6 post-window additions) --
    "weighted_median_price",
    "neyman_allocation",
    "changepoint_binseg",
    "kaplan_meier_retention",
    "cross_correlation_lags",
    "calibration_bins",
    "psi_drift",
    "ndcg_eval",
    "image_dhash_neardup",
    "token_budget_epochs",
    # -- stale greens: source/oracle hash changed after their last driver row --
    "equi_depth_histogram",
    "rfm_segmentation",
    "seasonality_index",
    "unpivot_supplier_metrics",
    "q5_local_supplier_volume",
    "chrono_split",
    "consensus_tally",
    "flag_groups",
    "summary_top_lists",
    "wintracker_pipeline",
    # -- stale greens: ranks.py interpolation consumers (operator edited) --
    "group_quantiles",
    "sweep_rollup",
    "mad_outliers",
    "trader_pipeline",
    "fulfillment_latency",
    # -- freshness re-rows: oldest (r2-vintage) green rows --
    "asof_entry_bar",
    "asof_last_prior",
    "bracket_exit_scan",
    "chunk_split",
    "contamination_check",
    "cosine_lsh_topk",
    "cosine_topk",
    "dedup_keep_best",
    "doc_fingerprint",
    "domain_mix_rebalance",
    "embedding_neardup_lsh",
    "embedding_neardup_pairs",
    "embedding_quantize_int8",
    "enrichment_pipeline",
    "ewm_ema",
    "exact_dedup",
    "hash_split",
    "incremental_dedup_probe",
    "ivf_centroid_assign",
    # -- round-7 additions fill the remaining slots (appended as built) --
    "cross_modal_dedup_audit",
    "kmeans_train_converged",
    "pagerank_power_lattice",
    "gram_power_iteration",
    "expectation_audit",
    "label_propagation_rounds",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry, ordered
    so the driver's 50-query correctness window sees ``_WINDOW_FRONT`` first."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    front = {n: REGISTRY[n] for n in _WINDOW_FRONT if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in front}
    return {**front, **rest}
