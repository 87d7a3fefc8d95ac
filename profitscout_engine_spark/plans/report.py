"""Per-query plan-quality report: run every registered query's plan
through :func:`plan_flags` and print one line each — the `.explain`
iteration loop, mechanized.

    python -m profitscout_engine_spark.plans.report [sf_dir]
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from ..queries import load_registry
    from ..session import get_spark
    from . import plan_flags

    spark = get_spark()
    registry = load_registry()
    for name in sorted(registry):
        try:
            flags = plan_flags(registry[name].fn(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"{name:32s} ERROR {exc}")
            continue
        marks = []
        if flags["pushed_filters"]:
            marks.append("pushdown")
        if flags["broadcast_joins"]:
            marks.append(f"bhj={flags['broadcast_joins']}")
        if flags["sortmerge_joins"]:
            marks.append(f"smj={flags['sortmerge_joins']}")
        if flags["cartesian"]:
            marks.append("CARTESIAN!")
        if flags["bnl_join"]:
            marks.append("bnlj")
        if flags["python_eval"]:
            marks.append("PYTHON-ROW!")
        if flags["pandas_groups"]:
            marks.append("arrow-pandas")
        marks.append(f"xchg={flags['exchanges']}")
        print(f"{name:32s} {' '.join(marks)}")


if __name__ == "__main__":
    main()
