"""Empty-input robustness: every registered query must execute (not
crash) against a schema-identical ZERO-ROW copy of all fixture tables —
the day-one / fresh-partition state every production pipeline hits."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from profitscout_engine_spark.queries import load_registry

REGISTRY = load_registry()

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def empty_sf_dir(sf_dir, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def test_every_query_survives_empty_corpus(spark, empty_sf_dir):
    failures = []
    for name, spec in REGISTRY.items():
        try:
            spec.fn(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — collecting, not masking
            failures.append(f"{name}: {str(ex).splitlines()[0][:120]}")
    assert not failures, "\n".join(failures)
