"""Behavioral tests for the §2.10 external-enrichment boundary
(sources/enrichment.py) — networked sources can't be oracle-paired, so the
contract is pinned here: determinism, retry schedule, throttle spacing,
partition-bounded concurrency, audit-blob round-trip into the P10 parse."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from profitscout_engine_spark.sources.enrichment import (
    MAX_RETRIES,
    TransientError,
    _RateGate,
    call_with_retry,
    enrich_external,
    read_audit_blobs,
    stub_news_client,
    write_audit_blobs,
)


def _fails_before(ticker: str, direction: str = "BULLISH") -> int:
    h = hashlib.md5(f"{ticker}|{direction}".encode()).hexdigest()
    return int(h[0], 16) // 6


def _ticker_with(pred, limit: int = 5000) -> str:
    for i in range(limit):
        tk = f"TK{i}"
        if pred(tk):
            return tk
    raise AssertionError("no ticker found matching predicate")


def _signals(spark, tickers):
    return spark.createDataFrame(
        [(tk, "BULLISH" if i % 2 == 0 else "BEARISH", 1.5 + i, 1000.0 * i, 500.0 * i)
         for i, tk in enumerate(tickers)],
        "ticker string, direction string, price_change_pct double, "
        "call_dollar_volume double, put_dollar_volume double",
    )


def test_retry_schedule_and_statuses():
    """Unit-level: the retry loop matches the reference's semantics —
    transient failures consume attempts, success records the attempt
    count, permanent no-analysis is not retried spuriously."""
    clean = _ticker_with(lambda t: _fails_before(t) == 0
                         and not hashlib.md5(f"{t}|BULLISH".encode()).hexdigest().startswith("00"))
    retry2 = _ticker_with(lambda t: _fails_before(t) == 2)
    perm = _ticker_with(
        lambda t: hashlib.md5(f"{t}|BULLISH".encode()).hexdigest().startswith("00")
    )
    a, s, n = call_with_retry(
        stub_news_client, ticker=clean, direction="BULLISH", move_pct=1.0, flow_vol=0.0
    )
    assert s == "ok" and n == 1 and a["ticker"] == clean
    a, s, n = call_with_retry(
        stub_news_client, ticker=retry2, direction="BULLISH", move_pct=1.0, flow_vol=0.0
    )
    assert s == "ok" and n == 3  # two transient failures, third attempt wins
    a, s, n = call_with_retry(
        stub_news_client, ticker=perm, direction="BULLISH", move_pct=1.0, flow_vol=0.0
    )
    assert a is None and s == "no_analysis" and n == 1


def test_retry_exhaustion_and_nontransient_propagation():
    def always_transient(attempt, **kw):
        raise TransientError(429)

    a, s, n = call_with_retry(always_transient, ticker="X")
    assert a is None and s == "transient_exhausted" and n == MAX_RETRIES

    def auth_bug(attempt, **kw):
        raise ValueError("bad credentials")

    with pytest.raises(ValueError):
        call_with_retry(auth_bug, ticker="X")


def test_rate_gate_spacing():
    """The throttle enforces min spacing with an injectable clock — the
    schedule is asserted, not wall-clocked."""
    now = [0.0]
    slept = []

    def clock():
        return now[0]

    def sleeper(dt):
        slept.append(round(dt, 6))
        now[0] += dt

    gate = _RateGate(0.5, clock=clock, sleeper=sleeper)
    gate.wait()          # first call: free
    gate.wait()          # 0.5s due
    now[0] += 0.2
    gate.wait()          # 0.3s due
    now[0] += 0.9
    gate.wait()          # already past due: free
    assert slept == [0.5, 0.3]


def test_enrich_external_deterministic_and_bounded(spark):
    tickers = [f"TK{i}" for i in range(40)]
    sig = _signals(spark, tickers)
    out = enrich_external(sig, min_interval_s=0.0, max_workers=2)
    assert out.rdd.getNumPartitions() == 2  # pool-of-2 as partition bound
    rows1 = {r["ticker"]: r for r in out.collect()}
    rows2 = {r["ticker"]: r for r in enrich_external(
        sig, min_interval_s=0.0, max_workers=2).collect()}
    assert len(rows1) == 40
    for tk in tickers:
        assert rows1[tk] == rows2[tk]  # bit-identical across runs
    # retry accounting surfaces in the frame
    direction = {r["ticker"]: r["direction"] for r in sig.collect()}
    for tk, r in rows1.items():
        fb = _fails_before(tk, direction[tk])
        if hashlib.md5(f"{tk}|{direction[tk]}".encode()).hexdigest().startswith("00"):
            assert r["status"] == "no_analysis" and r["payload"] is None
        else:
            assert r["status"] == "ok" and r["attempts"] == fb + 1
            payload = json.loads(r["payload"])
            assert payload["direction"] == direction[tk]
            # direction rule: BULLISH -> call volume, else put volume
            i = tickers.index(tk)
            want_flow = 1000.0 * i if direction[tk] == "BULLISH" else 500.0 * i
            assert payload["flow_volume"] == want_flow


def test_audit_blob_roundtrip_feeds_p10(spark, tmp_path):
    sig = _signals(spark, [f"TK{i}" for i in range(12)])
    out = enrich_external(sig, min_interval_s=0.0)
    path = str(tmp_path / "news_blobs")
    write_audit_blobs(out, path, run_date="2026-08-15")
    back = read_audit_blobs(spark, path)
    assert {"ticker", "run_date", "payload"} <= set(back.columns)
    n_ok = out.where(F.col("payload").isNotNull()).count()
    assert back.count() == n_ok
    # the blob payload parses through the P10 path (get_json_object)
    parsed = back.select(
        "ticker",
        F.get_json_object("payload", "$.sentiment_bp").cast("long").alias("s"),
        F.get_json_object("payload", "$.news_found").cast("boolean").alias("nf"),
    )
    assert parsed.where(F.col("s").isNull() | F.col("nf").isNull()).count() == 0
    for r in parsed.collect():
        assert -1000 <= r["s"] <= 1000
