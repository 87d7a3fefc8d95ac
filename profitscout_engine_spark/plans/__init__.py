"""Physical-plan inspection & quality gates.

The 100 TB design rules, written as assertions over Catalyst's formatted
output: filters/projections must reach the parquet scan, small dims must
broadcast, pair generators must never cartesian-product, Python must stay
out of hot paths. Used by tests/test_plans.py and runnable standalone:

    python -m profitscout_engine_spark.plans.report
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(plan: str) -> str:
    """The PushedFilters line of the first scan in a formatted plan."""
    if "PushedFilters:" not in plan:
        return ""
    return plan.split("PushedFilters:")[1].split("\n")[0].strip()


def read_schema(plan: str) -> str:
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:")[1].split("\n")[0].strip()


def plan_flags(df: DataFrame) -> dict[str, bool | int]:
    """Structural quality signals for one query plan."""
    plan = explain_str(df)
    return {
        "pushed_filters": "PushedFilters: []" not in plan and "PushedFilters:" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": "CartesianProduct" in plan,
        "bnl_join": "BroadcastNestedLoopJoin" in plan,
        # row-at-a-time Python: always a defect in this engine
        "python_eval": "BatchEvalPython" in plan,
        # vectorized Arrow scalar hop: allowed only for declared kernels
        "arrow_eval": "ArrowEvalPython" in plan,
        "pandas_groups": "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan,
        "exchanges": plan.count("Exchange"),
    }
