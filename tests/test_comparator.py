"""Comparator-parity regression suite for tests/conftest.py.

Round-5 lesson: the driver's typed value hash distinguishes tz-aware from
tz-naive timestamps, but the local comparator stripped tz before the dtype
gate, so every local sweep passed `sliding_window_rate` while the driver
failed it (DuckDB `to_timestamp()` returns TIMESTAMP WITH TIME ZONE). These
tests pin the comparator to driver semantics so that class of gap cannot
silently reopen.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

from .conftest import assert_frames_match, canonical_dtype


def _naive_frame():
    return pd.DataFrame(
        {"ts": pd.to_datetime(["1970-01-01 00:30:00", "1970-01-01 01:00:00"]), "n": [1, 2]}
    )


def test_tz_aware_oracle_is_rejected():
    """A deliberately TIMESTAMPTZ oracle vs a naive Spark frame must FAIL
    the gate — this is exactly the r5 sliding_window_rate defect."""
    con = duckdb.connect()
    tz_df = con.sql(
        "SELECT to_timestamp(1800) AS ts, 1::BIGINT AS n "
        "UNION ALL SELECT to_timestamp(3600), 2::BIGINT"
    ).df()
    assert getattr(tz_df["ts"].dtype, "tz", None) is not None, "fixture must be tz-aware"
    with pytest.raises(AssertionError, match="dtype drift"):
        assert_frames_match(_naive_frame(), tz_df, "tz_regression")
    con.close()


def test_tz_naive_cast_oracle_passes():
    """The CAST(... AS TIMESTAMP) fix form must pass (values line up with
    epoch seconds 1800/3600 in naive UTC)."""
    con = duckdb.connect()
    fixed = con.sql(
        "SELECT CAST(to_timestamp(1800) AS TIMESTAMP) AS ts, 1::BIGINT AS n "
        "UNION ALL SELECT CAST(to_timestamp(3600) AS TIMESTAMP), 2::BIGINT"
    ).df()
    assert_frames_match(_naive_frame(), fixed, "tz_fixed")
    con.close()


def test_date_vs_timestamp_still_tolerated():
    """date-vs-timestamp drift is empirically driver-tolerated (r1-r5 green
    rows on DATE-emitting queries) — keep that tolerance."""
    dates = pd.DataFrame({"d": [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]})
    stamps = pd.DataFrame({"d": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    assert_frames_match(dates, stamps, "date_vs_ts")


def test_int_float_drift_still_rejected():
    """Numeric kind drift (the round-2 HUGEINT lesson) must keep failing."""
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([1.0, 2.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype drift"):
        assert_frames_match(a, b, "kind_regression")


def test_canonical_dtype_tz_classes():
    naive = pd.Series(pd.to_datetime(["2024-01-01"]))
    aware = pd.Series(pd.to_datetime(["2024-01-01"]).tz_localize("UTC"))
    assert canonical_dtype(naive) == "datetime"
    assert canonical_dtype(aware) == "datetime[tz]"
    # resolution differences still collapse
    assert canonical_dtype(naive.astype("datetime64[us]")) == "datetime"
