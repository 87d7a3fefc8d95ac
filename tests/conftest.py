"""Shared test fixtures: one SparkSession per session, a DuckDB oracle, and
the driver-shaped comparison (sorted columns, order-insensitive rows)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profitscout_engine_spark.catalog import TABLES  # noqa: E402
from profitscout_engine_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    yield con
    con.close()


def coerce(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sort + the driver-TOLERATED coercions only: date objects to
    naive datetime (date-vs-timestamp drift has r1-r5 green driver rows),
    -0.0 folded into 0.0. Deliberately does NOT strip timezones — the
    driver's typed value hash distinguishes tz-aware from tz-naive (the
    r5 `sliding_window_rate` red row: DuckDB to_timestamp() returns
    TIMESTAMPTZ, Spark emitted plain TIMESTAMP; the old comparator's
    tz_localize(None) masked it and every local gate passed a query the
    driver failed)."""
    import datetime

    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c] + 0.0  # -0.0 → 0.0
        elif out[c].dtype == object:
            sample = out[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date):
                out[c] = pd.to_datetime(out[c])
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Value-comparison form: `coerce` + tz stripped (AFTER the dtype-drift
    gate has already seen tz-awareness) + rows sorted by every column."""
    out = coerce(df)
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def canonical_dtype(s: pd.Series) -> str:
    """Dtype class as the driver's TYPED value hash sees it: datetime
    RESOLUTIONS collapse (ns vs us is a pandas artifact) but tz-AWARENESS
    is preserved — a tz-aware column hashes differently than a naive one
    (r5 lesson). Numeric KIND and WIDTH are preserved: DuckDB
    HUGEINT→float64 vs Spark int64 broke the round-2 driver hash while
    values were bit-identical, so int/float drift must fail loudly here."""
    d = str(s.dtype)
    if d.startswith("datetime64"):
        return "datetime[tz]" if getattr(s.dtype, "tz", None) is not None else "datetime"
    return d


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = ""):
    ca, cb = coerce(spark_df), coerce(oracle_df)
    assert list(ca.columns) == list(cb.columns), f"{name}: columns {list(ca.columns)} != {list(cb.columns)}"
    dt_a = {c: canonical_dtype(ca[c]) for c in ca.columns}
    dt_b = {c: canonical_dtype(cb[c]) for c in cb.columns}
    drift = {c: (dt_a[c], dt_b[c]) for c in ca.columns if dt_a[c] != dt_b[c]}
    assert not drift, (
        f"{name}: dtype drift (breaks the driver's typed value hash even when "
        f"values are identical — see NOTES.md trap log): {drift}"
    )
    a, b = normalize(spark_df), normalize(oracle_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name or "query")
