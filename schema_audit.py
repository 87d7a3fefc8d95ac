"""Strict-schema audit: every oracle's DuckDB declared types vs the Spark
query schema, with NO canonicalization (VERDICT r5 item 4).

The r5 red row (`sliding_window_rate`) was a *typed-schema* divergence the
value-level comparator masked: DuckDB `to_timestamp()` yields TIMESTAMP WITH
TIME ZONE while Spark emits plain TIMESTAMP. This tool kills the class, not
the instance — it maps both engines' declared column types to one canonical
vocabulary and reports EVERY divergence, annotating which are empirically
driver-tolerated (date-vs-timestamp: r1-r5 green rows exist) and which would
break the driver's typed value hash (tz, HUGEINT, DECIMAL, width/kind).

Usage: python schema_audit.py [sf_dir]   (default /root/testdata/sf0.001)

DuckDB types come from the lazy relation (`con.sql(q).types`) — no oracle
executes. Spark schemas come from the logical plan; a handful of builders
collect bounded literals (ranks boundaries) or run a stream, so the Spark
side does touch data at the audit SF.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profitscout_engine_spark.catalog import TABLES  # noqa: E402
from profitscout_engine_spark.queries import load_registry  # noqa: E402
from profitscout_engine_spark.session import get_spark  # noqa: E402

# Spark simpleString -> canonical
_SPARK = {
    "tinyint": "int8", "smallint": "int16", "int": "int32", "bigint": "int64",
    "float": "float32", "double": "float64", "string": "str",
    "boolean": "bool", "date": "date", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}

# DuckDB type str -> canonical (anything absent stays raw and flags loudly)
_DUCK = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "HUGEINT!", "FLOAT": "float32",
    "DOUBLE": "float64", "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "TIMESTAMPTZ!",
}

# empirically driver-tolerated divergences (green rows r1-r5)
_TOLERATED = {("date", "timestamp"), ("timestamp", "date")}


def canon_spark(dt: str) -> str:
    if dt.startswith("decimal"):
        return f"DECIMAL!{dt}"
    return _SPARK.get(dt, dt)


def canon_duck(dt: str) -> str:
    if dt.startswith("DECIMAL"):
        return f"DECIMAL!{dt.lower()}"
    return _DUCK.get(dt, dt)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry = load_registry()
    spark = get_spark(master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"))
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    hard, soft, errors, clean = [], [], [], 0
    for name, spec in registry.items():
        if spec.oracle is None:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            s_types = {f.name: canon_spark(f.dataType.simpleString()) for f in sdf.schema.fields}
            rel = con.sql(spec.oracle)
            o_types = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
        except Exception as exc:  # noqa: BLE001 — audit must report, not die
            errors.append((name, repr(exc)[:200]))
            continue
        if set(s_types) != set(o_types):
            hard.append((name, "COLUMNS", sorted(set(s_types) ^ set(o_types))))
            continue
        drift = {c: (s_types[c], o_types[c]) for c in s_types if s_types[c] != o_types[c]}
        bad = {c: v for c, v in drift.items() if v not in _TOLERATED}
        tol = {c: v for c, v in drift.items() if v in _TOLERATED}
        if bad:
            hard.append((name, "TYPES", bad))
        elif tol:
            soft.append((name, tol))
        else:
            clean += 1

    print(f"\n=== strict-schema audit @ {sf_dir} ===")
    print(f"clean: {clean}   tolerated(date/ts): {len(soft)}   HARD: {len(hard)}   errors: {len(errors)}")
    for name, kind, detail in hard:
        print(f"HARD {name}: {kind} {detail}")
    for name, tol in soft:
        print(f"soft {name}: {tol}")
    for name, err in errors:
        print(f"ERR  {name}: {err}")
    return 1 if hard or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
