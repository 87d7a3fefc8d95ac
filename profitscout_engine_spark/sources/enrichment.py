"""External-model enrichment boundary (SURVEY §2.10): batched, throttled,
retried calls to an external analysis service from inside a Spark job, with
a per-key JSON audit-blob sink.

Reference semantics re-expressed (enrichment-trigger/main.py):

- ``fetch_and_analyze_news`` (:94-240): one external LLM/search call per
  signal; ``MAX_RETRIES = 3`` with retry only on transient codes
  ``{429, 499, 504}``; a permanently-failing signal yields ``None``.
- ``fetch_and_analyze_news_batch`` (:243-295): a pool of exactly 2
  concurrent workers ("2 concurrent workers to avoid 429 rate limits")
  plus a 0.5 s sleep per completion (~2 req/s aggregate), and a per-ticker
  GCS audit blob ``{prefix}{ticker}_{today}.json`` for every successful
  analysis (:272-277).

Spark-first shape: the call is a ``mapInPandas`` kernel — Arrow batches
in, enriched rows out — with the pool-of-N concurrency bound expressed as
the PARTITION COUNT (``repartition(max_workers)``): Spark runs one kernel
instance per partition, so N partitions IS the reference's
ThreadPoolExecutor(max_workers=N), and the per-partition rate gate spaces
calls so the aggregate rate stays at ``max_workers / min_interval_s``.
At warehouse scale you raise ``max_workers`` to the provider quota, not
the cluster size — the throttle, not the cluster, is the bottleneck by
design.

The external service itself is STUBBED deterministically (this container
has no network): ``stub_news_client`` derives the analysis — and the
transient-failure schedule that exercises the retry path — from md5 of
the inputs, so every run, every engine, and every test sees identical
payloads. The Spark-side plumbing (schema, Arrow batching, partition
bounds, retry/throttle/audit) is real.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_RETRIES = 3  # enrichment-trigger/main.py:96
TRANSIENT_CODES = frozenset({429, 499, 504})  # :97
DEFAULT_WORKERS = 2  # :282 "2 concurrent workers"
DEFAULT_INTERVAL_S = 0.5  # :287 time.sleep(0.5)

ENRICH_SCHEMA = (
    "ticker string, direction string, payload string, status string, "
    "attempts int"
)


class TransientError(Exception):
    """Retryable provider error (HTTP 429/499/504 analogue)."""

    def __init__(self, code: int):
        super().__init__(f"transient provider error {code}")
        self.code = code


def stub_news_client(
    ticker: str, direction: str, move_pct: float, flow_vol: float, attempt: int
) -> dict | None:
    """Deterministic stand-in for the grounded-search analysis call.

    Failure schedule (pure function of the ticker, so runs are
    replayable): the first md5 nibble fixes how many TRANSIENT failures
    precede success (nibble 0-5 → 0, 6-b → 1, c-f → 2 — always < 3, so
    retries eventually win), and a ticker whose digest starts with "00"
    fails PERMANENTLY (returns None after exhausting retries), matching
    the reference's analysis=None path. Payload fields are md5-derived so
    downstream JSON parsing (P10) has real structure to extract."""
    h = hashlib.md5(f"{ticker}|{direction}".encode()).hexdigest()
    if h.startswith("00"):
        return None  # permanent: "no analysis" after retries
    fails_before = int(h[0], 16) // 6
    if attempt < fails_before:
        raise TransientError(sorted(TRANSIENT_CODES)[int(h[1], 16) % 3])
    news_found = int(h[2], 16) >= 4
    # Sentiment in INTEGER basis points (-1000..1000), never a rounded
    # float: integers survive the JSON round-trip bit-exactly and a SQL
    # oracle can replay them from the same md5 digest (Python's round()
    # is banker's rounding — unreplayable in ROUND()-half-up engines).
    return {
        "ticker": ticker,
        "direction": direction,
        "news_found": news_found,
        "sentiment_bp": int(h[3:7], 16) % 2001 - 1000,
        "headline_count": int(h[7], 16) if news_found else 0,
        "price_change_pct": move_pct,
        "flow_volume": flow_vol,
    }


class _RateGate:
    """Minimum-interval spacing between consecutive calls (one instance
    per partition = per worker, mirroring the reference's per-completion
    0.5 s sleep). Injectable clock/sleeper so tests assert the schedule
    without wall-clock waits."""

    def __init__(
        self,
        min_interval_s: float,
        clock: Callable[[], float] = time.monotonic,
        sleeper: Callable[[float], None] = time.sleep,
    ):
        self.min_interval_s = min_interval_s
        self._clock = clock
        self._sleep = sleeper
        self._last: float | None = None

    def wait(self) -> None:
        now = self._clock()
        if self._last is not None:
            due = self._last + self.min_interval_s
            if now < due:
                self._sleep(due - now)
                now = due
        self._last = now


def call_with_retry(
    client: Callable[..., dict | None],
    max_retries: int = MAX_RETRIES,
    **kwargs,
) -> tuple[dict | None, str, int]:
    """The reference's retry loop (:98-240): up to ``max_retries``
    attempts, retrying ONLY transient errors; returns
    (analysis, status, attempts). A non-transient exception propagates —
    a schema/auth bug must fail the job, not be swallowed as no-news."""
    for attempt in range(max_retries):
        try:
            analysis = client(attempt=attempt, **kwargs)
        except TransientError:
            if attempt == max_retries - 1:
                return None, "transient_exhausted", max_retries
            continue
        if analysis is None:
            return None, "no_analysis", attempt + 1
        return analysis, "ok", attempt + 1
    return None, "transient_exhausted", max_retries


def enrich_external(
    signals: DataFrame,
    client: Callable[..., dict | None] = stub_news_client,
    max_workers: int = DEFAULT_WORKERS,
    min_interval_s: float = DEFAULT_INTERVAL_S,
    max_retries: int = MAX_RETRIES,
) -> DataFrame:
    """Enrich a signals frame through the external analysis boundary.

    Input columns: ticker, direction, price_change_pct,
    call_dollar_volume, put_dollar_volume. The flow volume passed to the
    provider follows the reference's direction rule (:256-260): BULLISH →
    call dollar volume, else put dollar volume. Output: one row per
    signal with the JSON payload string (null on failure), a status, and
    the attempt count — the audit columns the batch writer needs.

    Concurrency = partition count: ``repartition(max_workers)`` bounds
    in-flight calls exactly like the reference's pool of 2, and each
    partition's rate gate keeps its call spacing ≥ ``min_interval_s``."""
    import pandas as pd  # noqa: F401 (Arrow kernel contract)

    cols = [
        "ticker",
        "direction",
        "price_change_pct",
        "call_dollar_volume",
        "put_dollar_volume",
    ]

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        gate = _RateGate(min_interval_s)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                gate.wait()
                flow = (
                    row.call_dollar_volume
                    if row.direction == "BULLISH"
                    else row.put_dollar_volume
                )
                analysis, status, attempts = call_with_retry(
                    client,
                    max_retries=max_retries,
                    ticker=row.ticker,
                    direction=row.direction,
                    move_pct=float(row.price_change_pct),
                    flow_vol=float(flow or 0.0),
                )
                out.append(
                    (
                        row.ticker,
                        row.direction,
                        None if analysis is None else json.dumps(analysis),
                        status,
                        attempts,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["ticker", "direction", "payload", "status", "attempts"],
            )

    return (
        signals.select(*cols)
        .repartition(max_workers)
        .mapInPandas(kernel, ENRICH_SCHEMA)
    )


def write_audit_blobs(enriched: DataFrame, path: str, run_date: str) -> None:
    """GCS-style audit sink (:272-277): every successful analysis lands as
    a JSON record under ``{path}/run_date={run_date}/ticker={ticker}/`` —
    the per-key blob layout, expressed as a partitioned JSON write so the
    object store gets one prefix per ticker/day and readers prune by
    partition instead of listing everything."""
    (
        enriched.where(F.col("payload").isNotNull())
        .select("ticker", F.lit(run_date).alias("run_date"), "payload")
        .write.mode("overwrite")
        .partitionBy("run_date", "ticker")
        .json(path)
    )


def read_audit_blobs(spark: SparkSession, path: str) -> DataFrame:
    """Read the audit-blob layout back with partition discovery; the
    payload column feeds the P10 JSON-extraction path unchanged."""
    return spark.read.json(path)
