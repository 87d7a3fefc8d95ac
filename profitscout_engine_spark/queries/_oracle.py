"""Oracle-side SQL builders shared by query modules.

These emit DuckDB text only (never executed by Spark), so they may use
DuckDB-specific list functions freely.
"""

from __future__ import annotations


def exact_quantile_bounds_sql(src: str, col: str, probs: list[float], name: str) -> str:
    """CTE chain whose final CTE ``<name>`` is one row with column ``qs``:
    a LIST of exact interpolated quantiles of ``src.col``, computed with
    SPARK ``percentile()`` PARITY — the engine tree
    ``(ceil(p)-p)*lo + (p-floor(p))*hi`` at position ``p = q*(n-1)``,
    PLUS the equal-collapse rule: when the straddled order statistics are
    EQUAL, return the value exactly. DuckDB's ``quantile_cont`` computes
    the weighted sum even then, and ``w_lo*x + w_hi*x`` is an ULP off for
    non-dyadic weights — observed at the 2x replica, where every value is
    duplicated and the 0.3 boundary straddled two equal prices (NOTES.md
    trap log, round 6). Dyadic probs over integer values are exempt (every
    term exact), which is why the 1/16-bucket and quartile-over-int
    oracles never drifted.

    NULLs are excluded explicitly (ADVICE r6): ``list(col)`` KEEPS nulls
    while ``COUNT(col)`` doesn't, so without the filter the 1-based list
    indices would shift on any nullable column and the returned quantiles
    would be silently wrong.

    Splice into a WITH chain:  f"WITH {exact_quantile_bounds_sql(...)}, rest AS ..."
    """
    grid = ", ".join(f"({i + 1}, {q}E0)" for i, q in enumerate(probs))
    return f"""{name}_s AS (
        SELECT list_sort(list({col})) AS l, COUNT({col}) AS n FROM {src}
        WHERE {col} IS NOT NULL
    ),
    {name}_p AS (
        SELECT i, q * (n - 1) AS p,
               CAST(floor(q * (n - 1)) AS BIGINT) AS k, l, n
        FROM {name}_s, (VALUES {grid}) g(i, q)
    ),
    {name}_v AS (
        SELECT i,
               CASE WHEN p = k OR l[k + 1] = l[LEAST(k + 2, n)]
                    THEN l[k + 1]
                    ELSE (k + 1 - p) * l[k + 1]
                         + (p - k) * l[LEAST(k + 2, n)] END AS qval
        FROM {name}_p
    ),
    {name} AS (SELECT list(qval ORDER BY i) AS qs FROM {name}_v)"""
