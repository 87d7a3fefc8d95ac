"""Distributed prefix sums (running totals in a global key order).

``SUM(v) OVER (ORDER BY key)`` with no PARTITION BY funnels the whole
frame through ONE task — the same failure mode ranks.py documents for
global ranks, and the reason naive cumulative-weight operators die at
scale. The scale-safe decomposition mirrors ``ranks.with_avg_rank``:

1. Assign every row an ordered range-bucket id that is a PURE FUNCTION
   of the key (boundaries = approximate quantiles collected once as
   literals — value-deterministic, so recomputed subtrees can never
   disagree about a row's bucket; see ranks.py's header for the
   repartitionByRange drift this avoids).
2. Per-bucket value sums (<= num_buckets rows) -> running offsets via a
   window over the bounded bucket frame only -> broadcast back.
3. Within-bucket running sum — distributed, one sort per range slice.
4. global prefix sum = bucket offset + within-bucket running sum.

Boundary quality only affects load balance, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ranks import _as_double, _bucket_expr

_BKT = "_psum_bkt"


def with_prefix_sum(
    df: DataFrame,
    key: str | Column,
    value: str | Column,
    out: str,
    num_buckets: int = 32,
) -> DataFrame:
    """Append column ``out`` holding the inclusive running total of
    ``value`` in ascending ``key`` order, computed without any
    single-partition window.

    Ties on ``key`` follow SQL RANGE-frame semantics (all peers of a key
    value share the sum through the last peer) — identical to
    ``SUM(v) OVER (ORDER BY key)`` — because tied keys land in one
    bucket by construction and the within-bucket window uses the default
    RANGE frame. The sum's result type follows Spark's ``sum`` (BIGINT
    stays BIGINT: integer weights keep the total exact).
    """
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    dkey = _as_double(df, k)
    qs = [i / num_buckets for i in range(1, num_buckets)]
    # One tiny driver round-trip: boundary literals shared by every branch.
    [row] = df.select(
        F.percentile_approx(dkey, F.array(*[F.lit(q) for q in qs])).alias("b")
    ).collect()
    boundaries = sorted(set(row["b"] or []))
    part = df.withColumn(_BKT, _bucket_expr(dkey, boundaries))
    # Bounded frame: at most num_buckets + 1 rows — the one permissible
    # unpartitioned window in this pattern (ranks.py precedent).
    offsets = (
        part.groupBy(_BKT)
        .agg(F.sum(v).alias("_s"))
        .select(
            _BKT,
            F.coalesce(
                F.sum("_s").over(
                    Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("_off"),
        )
    )
    w_local = Window.partitionBy(_BKT).orderBy(k)
    return (
        part.withColumn("_run", F.sum(v).over(w_local))
        .join(F.broadcast(offsets), _BKT)
        .withColumn(out, F.col("_off") + F.col("_run"))
        .drop(_BKT, "_run", "_off")
    )
