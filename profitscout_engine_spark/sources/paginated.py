"""Paginated-JSON custom DataSource (SURVEY §2.1 S2).

The reference pages REST snapshots with a cursor protocol — each response
carries a ``results`` array and a ``next_url`` cursor, looped until the
cursor disappears (enrichment polygon client,
src/enrichment/core/clients/polygon_client.py:196-210, behavioral
reference only). Spark-first shape: a Python Data Source
(``spark.read.format("paged_json")``) so the paged protocol becomes a
proper scan node — schema'd, plannable, and parallel.

Scale design: ONE cursor chain is inherently sequential (each page names
the next), so the parallelism unit is the CHAIN, not the page — real
ingests shard the keyspace (per ticker, per day) into many independent
chains. The ``paths`` option takes N start cursors and plans one input
partition per chain; executors walk their chains concurrently and emit
rows straight into the scan. A single ``path`` degrades to one
partition, which is exactly the protocol's intrinsic parallelism.

Pages here are file URIs (the container has no network); swapping the
``_fetch`` body for an HTTP GET is the only change a live API needs —
the cursor walk, schema projection, and partition planning are shared.

Everything is defined inside a factory so cloudpickle ships the classes
BY VALUE: executor Python workers don't have this package on their
import path (see operators/multimodal.py for the same pattern).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

FORMAT_NAME = "paged_json"


def paged_json_datasource():
    """Build the DataSource class (fresh per call; see module docstring)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    def _fetch(uri: str) -> dict:
        # File-backed page fetch; a live client swaps this one function
        # for an HTTP GET with retry/backoff.
        path = uri[len("file://") :] if uri.startswith("file://") else uri
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)

    def _walk(start: str, results_key: str, next_key: str, max_pages: int):
        """Follow the cursor chain from ``start``, yielding result dicts."""
        uri, pages = start, 0
        while uri and pages < max_pages:
            page = _fetch(uri)
            yield from page.get(results_key) or []
            uri = page.get(next_key)
            pages += 1
        if uri:
            raise RuntimeError(
                f"cursor chain from {start!r} exceeded max_pages={max_pages}"
            )

    def _infer_type(value):
        if isinstance(value, bool):
            return BooleanType()
        if isinstance(value, int):
            return LongType()
        if isinstance(value, float):
            return DoubleType()
        return StringType()

    class ChainPartition(InputPartition):
        def __init__(self, start: str):
            self.start = start

    class PagedJsonReader(DataSourceReader):
        def __init__(self, schema: StructType, options):
            self.schema = schema
            self.starts = _start_uris(options)
            self.results_key = options.get("results_key", "results")
            self.next_key = options.get("next_key", "next_url")
            self.max_pages = int(options.get("max_pages", 1000))

        def partitions(self):
            return [ChainPartition(s) for s in self.starts]

        def read(self, partition):
            fields = [f.name for f in self.schema.fields]
            for rec in _walk(
                partition.start, self.results_key, self.next_key, self.max_pages
            ):
                yield tuple(rec.get(f) for f in fields)

    class PagedJsonDataSource(DataSource):
        """spark.read.format("paged_json") — cursor-paged JSON scan.

        Options: ``path`` (one start cursor) or ``paths`` (comma-separated
        start cursors → one partition each), ``results_key``, ``next_key``,
        ``max_pages`` (runaway-cursor guard, default 1000).
        """

        @classmethod
        def name(cls):
            return FORMAT_NAME

        def schema(self):
            # Infer from the first record of the first chain: field order
            # as given, scalar types mapped JSON→Spark. Pass an explicit
            # .schema(...) to skip inference (and this driver-side fetch).
            opts = self.options
            first = next(
                _walk(
                    _start_uris(opts)[0],
                    opts.get("results_key", "results"),
                    opts.get("next_key", "next_url"),
                    int(opts.get("max_pages", 1000)),
                ),
                None,
            )
            if first is None:
                raise ValueError("paged_json: cannot infer schema from empty chain")
            return StructType(
                [StructField(k, _infer_type(v), True) for k, v in first.items()]
            )

        def reader(self, schema):
            return PagedJsonReader(schema, self.options)

        def simpleStreamReader(self, schema):
            return PagedJsonStreamReader(schema, self.options)

    class PagedJsonStreamReader(SimpleDataSourceStreamReader):
        """Tail-follow the cursor chain as an UNBOUNDED stream — the
        incremental-poll ingest pattern: pages already read are immutable;
        new data arrives by the tail page growing a ``next`` cursor. The
        stream offset is ``{"last": <last page read>, "pending": <known-
        but-unread page or null>}``; each micro-batch walks every page
        that has appeared since, and when there is no known pending page
        it re-polls the tail for a fresh cursor (empty batch if none).
        Offsets are plain dicts → checkpointable; recovery replays any
        (start, end) range deterministically because pages are immutable
        (``readBetweenOffsets``)."""

        def __init__(self, schema: StructType, options):
            self.fields = [f.name for f in schema.fields]
            starts = _start_uris(options)
            if len(starts) != 1:
                raise ValueError("paged_json streaming follows ONE chain per source")
            self.start = starts[0]
            self.results_key = options.get("results_key", "results")
            self.next_key = options.get("next_key", "next_url")
            self.max_batch_pages = int(options.get("max_batch_pages", 100))

        def initialOffset(self):
            return {"last": None, "pending": self.start}

        def _rows(self, page: dict):
            return [
                tuple(rec.get(f) for f in self.fields)
                for rec in page.get(self.results_key) or []
            ]

        def _advance(self, start: dict, stop_last: str | None = None):
            rows: list[tuple] = []
            last, pending = start.get("last"), start.get("pending")
            if not pending and last is not None:
                # no known unread page: re-poll the tail for a new cursor
                pending = _fetch(last).get(self.next_key)
            uri, pages = pending, 0
            while uri and pages < self.max_batch_pages:
                page = _fetch(uri)
                rows.extend(self._rows(page))
                last, uri, pages = uri, page.get(self.next_key), pages + 1
                if stop_last is not None and last == stop_last:
                    break
            return rows, {"last": last, "pending": uri}

        def read(self, start: dict):
            rows, end = self._advance(start)
            return iter(rows), end

        def readBetweenOffsets(self, start: dict, end: dict):
            rows, _ = self._advance(start, stop_last=end.get("last"))
            return iter(rows)

    def _start_uris(options) -> list[str]:
        paths = options.get("paths")
        if paths:
            return [p.strip() for p in paths.split(",") if p.strip()]
        path = options.get("path")
        if not path:
            raise ValueError("paged_json requires a 'path' or 'paths' option")
        return [path]

    return PagedJsonDataSource


def register_paged_json(spark: SparkSession) -> None:
    """Idempotently register the paged_json format on this session."""
    spark.dataSource.register(paged_json_datasource())


def read_paged_json(
    spark: SparkSession, starts: list[str], schema=None, **options
) -> DataFrame:
    """Convenience wrapper: register + read N cursor chains in parallel."""
    register_paged_json(spark)
    reader = spark.read.format(FORMAT_NAME).option("paths", ",".join(starts))
    for k, v in options.items():
        reader = reader.option(k, str(v))
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load()
