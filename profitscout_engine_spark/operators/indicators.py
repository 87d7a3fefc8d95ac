"""Exponentially-weighted indicators (SURVEY §2.5 W2): EMA, RSI, MACD.

The one indicator family with no native Spark window form (EWM is a
recursive kernel). Policy per SURVEY §7.3: pin pandas semantics by computing
inside ``applyInPandas`` — Arrow-batched, one group per entity, embarrassingly
parallel across entities. Entities are high-cardinality (tickers/users), so
group state is a single series that fits executor memory at any total scale.

Semantics pinned to the reference's pandas usage (enrichment-trigger
technicals, main.py:333-348): ``ewm(span=n, adjust=True)`` for EMA,
Wilder-style ``ewm(alpha=1/n, adjust=False)`` smoothing for RSI, MACD =
EMA12 − EMA26 with EMA9 signal (``adjust=False``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewm_indicator_frame(
    bars: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    close: str = "close",
    ema_span: int = 21,
    rsi_n: int = 14,
) -> DataFrame:
    """Per-entity EWM indicator block: ema_{span}, rsi_{n}, macd, macd_signal.

    One ``applyInPandas`` over groups of ``key``; within each group the series
    is sorted by (ts, order_id) and indicators computed with pandas EWM
    (identical to the reference's pandas_ta outputs for these kernels).
    """
    import pandas as pd

    schema = (
        f"{key} long, {order_id} long, ema double, rsi double, "
        "macd double, macd_signal double"
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, order_id])
        c = pdf[close]
        ema = c.ewm(span=ema_span, adjust=True).mean()

        delta = c.diff()
        gain = delta.clip(lower=0.0)
        loss = (-delta).clip(lower=0.0)
        avg_gain = gain.ewm(alpha=1.0 / rsi_n, adjust=False).mean()
        avg_loss = loss.ewm(alpha=1.0 / rsi_n, adjust=False).mean()
        rs = avg_gain / avg_loss
        rsi = 100.0 - 100.0 / (1.0 + rs)
        rsi = rsi.where(avg_loss > 0, 100.0).where(~(delta.isna()), None)

        ema12 = c.ewm(span=12, adjust=False).mean()
        ema26 = c.ewm(span=26, adjust=False).mean()
        macd = ema12 - ema26
        signal = macd.ewm(span=9, adjust=False).mean()

        return pd.DataFrame(
            {
                key: pdf[key],
                order_id: pdf[order_id],
                "ema": ema,
                "rsi": rsi,
                "macd": macd,
                "macd_signal": signal,
            }
        )

    # Explicit hash repartition on the group key: AQE's byte-based
    # partition coalescing would merge this small-by-bytes shuffle into
    # one partition and serialize all the (CPU-heavy) Python groups onto
    # a single core. A user-requested repartition is exempt from
    # coalescing, so the pandas stage keeps full parallelism.
    par = bars.sparkSession.sparkContext.defaultParallelism
    return bars.repartition(par, key).groupBy(key).applyInPandas(compute, schema)


def ema_weighted_sum(
    bars: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    close: str = "close",
    span: int = 21,
) -> DataFrame:
    """Closed-form EMA (adjust=True) as pure window algebra — no Python.

    ``ema_t = Σ_i x_i·(1-α)^(t-i) / Σ_i (1-α)^(t-i)`` factorizes into two
    running sums of ``x_i·(1-α)^(-i)`` terms, so the whole indicator is two
    window SUMs + a ratio, entirely inside codegen. Valid while
    ``(1-α)^(-row_index)`` stays finite (~10k rows/entity at span 21);
    beyond that use :func:`ewm_indicator_frame`.

    This form is also the oracle-SQL twin used for correctness checks.
    """
    from pyspark.sql.window import Window

    alpha = 2.0 / (span + 1.0)
    decay = 1.0 - alpha
    w_order = Window.partitionBy(key).orderBy(ts, order_id)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    rn = F.row_number().over(w_order)
    up = F.pow(F.lit(decay), -F.col("_rn"))
    return (
        bars.withColumn("_rn", rn)
        .withColumn("_num", F.col(close) * up)
        .withColumn("_den", up)
        .withColumn(
            "ema",
            (F.sum("_num").over(w_run) / F.sum("_den").over(w_run)),
        )
        .drop("_rn", "_num", "_den")
    )
