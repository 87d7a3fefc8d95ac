"""Named query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
the equivalent ANSI SQL a DuckDB oracle runs on the same parquet tables.

Determinism rules (the driver compares order-insensitive value hashes, with
columns sorted by name):
- alias every computed column identically on both sides;
- round every float output on BOTH sides (engines agree on the double bits of
  the inputs, so rounded derived values agree too);
- break every top-k / rank tie with a unique key so LIMIT/ROW_NUMBER pick the
  same rows in both engines;
- sort arrays before exposing them (collect_list order is nondeterministic).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 operator ids


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


_MODULES = (
    "relational",
    "aggregates",
    "windows",
    "execution",
    "textops",
    "similarity",
    "pipelines",
)


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return REGISTRY
