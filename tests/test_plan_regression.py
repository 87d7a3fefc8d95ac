"""Plan-regression gate: the physical-plan quality flags of every
directly-scanning query are pinned in PLANS.json (generated on
local[8] at sf0.001 — the same shape the session fixture builds).
A change that silently drops a pushed filter, turns a broadcast join
into a shuffle, introduces a cartesian product, or adds an exchange
fails HERE with a named diff, instead of surfacing rounds later as a
bench regression.

Queries that read session-shared cached frames (or run a stream to
completion) are listed in ``skipped_cache_dependent`` — their explain
output depends on what the session built earlier, so they are gated by
tests/test_plans.py's structural rules instead of exact snapshots.

Regenerate after INTENTIONAL plan changes: ``python plans_snapshot.py``.
"""

from __future__ import annotations

import json
import os

import pytest

from profitscout_engine_spark.plans import explain_str, plan_flags
from profitscout_engine_spark.queries import load_registry

SNAP_PATH = os.path.join(os.path.dirname(__file__), "..", "PLANS.json")
SNAP = json.load(open(SNAP_PATH))
REGISTRY = load_registry()


def test_snapshot_covers_registry():
    """Every registered query is either snapshotted or explicitly listed
    as cache-dependent — new queries must be added to PLANS.json."""
    covered = set(SNAP["flags"]) | set(SNAP["skipped_cache_dependent"])
    missing = sorted(set(REGISTRY) - covered)
    assert not missing, f"queries absent from PLANS.json: {missing}"


@pytest.mark.parametrize("name", sorted(SNAP["flags"]))
def test_plan_flags_match_snapshot(name, spark, sf_dir):
    if sf_dir != SNAP["sf_dir"]:
        pytest.skip("snapshot pinned at sf0.001")
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = explain_str(df)
    if "InMemoryTableScan" in plan or "InMemoryRelation" in plan:
        pytest.skip("shared frame already cached by an earlier test")
    got = plan_flags(df)
    want = SNAP["flags"][name]
    assert got == want, (
        f"{name}: plan drifted from PLANS.json — {dict(set(got.items()) ^ set(want.items()))}. "
        "If intentional, regenerate the snapshot."
    )
