"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def sr(expr: str, n: int) -> str:
    """Oracle-SQL twin of ``exprs.stable_round``: engine-stable half-up
    rounding as pure IEEE double arithmetic (see exprs.py for why plain
    ROUND() diverges between engines on half-boundary values)."""
    scale = f"1e{n}"
    return f"FLOOR(({expr}) * {scale} + 0.5) / {scale}"
