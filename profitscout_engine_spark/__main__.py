"""Engine CLI — run, explain, or list registered queries.

    python -m profitscout_engine_spark list [substring]
    python -m profitscout_engine_spark run <query> [--sf-dir DIR] [--limit N]
    python -m profitscout_engine_spark explain <query> [--sf-dir DIR]
    python -m profitscout_engine_spark bench <query> [--sf-dir DIR] [--n N]

`run` prints the result (bounded by --limit), `explain` the formatted
physical plan plus the plan-hygiene flags, `bench` best-of-N wall time.
The same registry the grading driver sees (`__spark_entry__.queries()`),
so anything runnable here is driver-runnable and vice versa.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="profitscout_engine_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substring", nargs="?", default="")

    for name in ("run", "explain", "bench"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        )
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
        if name == "bench":
            p.add_argument("--n", type=int, default=2)

    args = ap.parse_args(argv)

    from .queries import load_registry

    registry = load_registry()

    if args.cmd == "list":
        for qname, spec in registry.items():
            if args.substring in qname:
                kind = "oracle" if spec.oracle else "rows-only"
                print(f"{qname:36s} {kind:9s} {','.join(spec.tags)}")
        return 0

    if args.query not in registry:
        close = [q for q in registry if args.query in q]
        print(f"unknown query {args.query!r}; close matches: {close}", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"pse-{args.cmd}-{args.query}")
    fn = registry[args.query].fn

    if args.cmd == "run":
        df = fn(spark, args.sf_dir)
        t0 = time.time()
        df.show(args.limit, truncate=40)
        n = df.count()
        print(f"{n} rows in {time.time() - t0:.2f}s (showing up to {args.limit})")
        return 0

    if args.cmd == "explain":
        from .plans import explain_str, plan_flags

        df = fn(spark, args.sf_dir)
        print(explain_str(df))
        print("plan flags:", plan_flags(df))
        return 0

    # bench
    best = None
    for _ in range(args.n):
        t0 = time.time()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{args.query}: best-of-{args.n} {best:.3f}s at {args.sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
