"""Scale-up stress harness: measure how query runtime grows when the data
does.

The correctness sweeps stop at sf0.1; the design target is 100 TB. This
tool builds a K-times replica of selected sf0.1 tables under /tmp (keys
shifted per copy so entity cardinality grows with the data — replication
without key shifts would just deepen skew) and times a set of queries at
1x and Kx. A scale-safe plan should grow roughly linearly (ratio ≈ K on a
fixed-core box, modulo fixed overhead); a single-task global window or
one-buffer aggregate grows worse and eventually OOMs.

    python stress.py                       # default: 8x, round-5 rewrites
    python stress.py 4 q1_pricing_summary  # 4x, chosen queries

Perf-only: no oracle at the replicated scale (fixtures are
driver-provided; this synthesizes bytes purely to observe runtime).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profitscout_engine_spark.queries import load_registry
from profitscout_engine_spark.session import get_spark

BASE = os.environ.get("STRESS_BASE_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/pse_stress"

# (table, key columns to shift per replica) — shifts keep joins/groupings
# meaningful while growing entity cardinality linearly.
SHIFTS: dict[str, list[str]] = {
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": [],  # bounded dims stay bounded at any scale
    "nation": [],
    "region": [],
    "partsupp": [],
}

DEFAULT_QUERIES = [
    # the round-5 scale rewrites
    "spearman_rank_corr",
    "pairwise_return_corr",
    "chrono_split",
    "equi_depth_histogram",
    # round-5 additions
    "sweep_grid_full",
    "enrichment_news_rollup",
]


def build_replica(k: int) -> str:
    out = f"{STAGE}_x{k}"
    # Marker carries the source fixture's identity (size+mtime of the
    # largest table) so a regenerated fixture invalidates the replica.
    st = os.stat(f"{BASE}/events.parquet")
    marker = (
        f"{out}/_DONE_{os.path.basename(BASE)}_{k}_{st.st_size}_{int(st.st_mtime)}"
    )
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for tbl, keys in SHIFTS.items():
        src = f"{BASE}/{tbl}.parquet"
        if not os.path.exists(src):
            continue
        if not keys or k == 1:
            shutil.copyfile(src, f"{out}/{tbl}.parquet")
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        maxes = {
            key: con.sql(f"SELECT MAX({key}) FROM '{src}'").fetchone()[0] + 1
            for key in keys
        }
        sel = ", ".join(
            f"({c} + i * {maxes[c]}) AS {c}" if c in maxes else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}' CROSS JOIN range({k}) r(i)) "
            f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    open(marker, "w").close()
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8
    names = [a for a in sys.argv[1:] if not a.isdigit()] or DEFAULT_QUERIES
    reg = load_registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    print(f"building {k}x replica of {BASE} ...", flush=True)
    big = build_replica(k)
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    results = {}
    for name in names:
        reg[name].fn(spark, BASE).count()  # warm-up: JIT/codegen/IO cache
        times = {}
        for label, sf_dir in (("1x", BASE), (f"{k}x", big)):
            t0 = time.monotonic()
            n = reg[name].fn(spark, sf_dir).count()
            times[label] = (time.monotonic() - t0, n)
        r1, rk = times["1x"][0], times[f"{k}x"][0]
        results[name] = (r1, rk, rk / r1 if r1 > 0 else float("inf"))
        print(
            f"  {name:28s} 1x {r1:6.2f}s ({times['1x'][1]} rows)   "
            f"{k}x {rk:6.2f}s ({times[f'{k}x'][1]} rows)   ratio {rk / r1:5.2f}",
            flush=True,
        )
    worst = max(results.values(), key=lambda v: v[2])[2]
    print(f"worst ratio {worst:.2f} at {k}x replication")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
