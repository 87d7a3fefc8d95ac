"""Regenerate PLANS.json — the plan-regression snapshot that
tests/test_plan_regression.py gates against. Run after INTENTIONAL plan
changes:

    python plans_snapshot.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profitscout_engine_spark.plans import explain_str, plan_flags
from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[8]")
    sf = "/root/testdata/sf0.001"
    snap: dict[str, dict] = {}
    skipped: list[str] = []
    for name, spec in load_registry().items():
        try:
            df = spec.fn(spark, sf)
            plan = explain_str(df)
            # Shared-frame consumers' plans depend on what the session
            # cached earlier — structural rules gate them instead.
            if "InMemoryTableScan" in plan or "InMemoryRelation" in plan:
                skipped.append(name)
                continue
            snap[name] = plan_flags(df)
        except Exception:
            skipped.append(name)
    out = {"sf_dir": sf, "skipped_cache_dependent": sorted(skipped), "flags": snap}
    json.dump(out, open(os.path.join(os.path.dirname(__file__), "PLANS.json"), "w"),
              indent=1, sort_keys=True)
    print(f"snapshotted {len(snap)}, cache-dependent {len(skipped)}")


if __name__ == "__main__":
    main()
