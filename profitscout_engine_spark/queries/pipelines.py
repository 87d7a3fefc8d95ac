"""Pipeline-composition queries (SURVEY §3) — the flagship scanner ranking.

The scanner pipeline (overnight_scanner.py run_pipeline, §3.1) re-expressed
as ONE declarative DataFrame dag over the fixture star schema:

  chain scan → per-entity side-pivoted flow aggregation (A1-A3)
  → score ladder (§2.8) → broadcast dim enrichment (J1)
  → cluster-boost group-count join-back (J2) → rank + top-k (T1).

Fixture mapping (FIXTURES.md B1/B5): lineitem = options chain rows
(l_suppkey = ticker, l_linestatus = call/put side, extendedprice×(1-disc) =
notional, l_quantity = volume, l_partkey = strike); supplier⋈nation⋈region =
ticker metadata dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import r2
from ..operators.flow import side_flow_metrics
from ..operators.score import apply_cluster_boost, flow_score
from . import query
from ._util import t

_SCANNER_ORACLE = """
WITH flow AS (
    SELECT
        l_suppkey,
        SUM(CASE WHEN l_linestatus = 'O' THEN l_extendedprice * (1 - l_discount) END) AS call_dollar_vol,
        SUM(CASE WHEN l_linestatus <> 'O' THEN l_extendedprice * (1 - l_discount) END) AS put_dollar_vol,
        COUNT(DISTINCT CASE WHEN l_linestatus = 'O' AND l_quantity > 25 THEN l_partkey END) AS call_active_strikes,
        COUNT(DISTINCT CASE WHEN l_linestatus <> 'O' AND l_quantity > 25 THEN l_partkey END) AS put_active_strikes,
        SUM(CASE WHEN l_linestatus = 'O' AND l_quantity > 30
                 THEN (l_quantity - 30) * l_extendedprice * (1 - l_discount) END) AS call_uoa_depth,
        SUM(CASE WHEN l_linestatus <> 'O' AND l_quantity > 30
                 THEN (l_quantity - 30) * l_extendedprice * (1 - l_discount) END) AS put_uoa_depth
    FROM lineitem
    GROUP BY l_suppkey
),
scored AS (
    SELECT
        f.l_suppkey AS suppkey,
        s.s_name,
        n.n_name AS nation,
        r.r_name AS region,
        COALESCE(f.call_dollar_vol, 0) AS cn,
        COALESCE(f.put_dollar_vol, 0) AS pn,
        f.call_active_strikes,
        f.put_active_strikes,
        COALESCE(f.call_uoa_depth, 0) AS cu,
        COALESCE(f.put_uoa_depth, 0) AS pu,
        CASE WHEN COALESCE(f.call_dollar_vol, 0) >= COALESCE(f.put_dollar_vol, 0)
             THEN 'BULLISH' ELSE 'BEARISH' END AS direction
    FROM flow f
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
),
laddered AS (
    SELECT
        *,
        (CASE WHEN GREATEST(cn, pn) > LEAST(cn, pn) * 3.0 THEN 3
              WHEN GREATEST(cn, pn) > LEAST(cn, pn) * 2.0 THEN 2
              WHEN GREATEST(cn, pn) > LEAST(cn, pn) * 1.5 THEN 1
              ELSE 0 END
         + CASE WHEN (CASE WHEN cn >= pn THEN call_active_strikes ELSE put_active_strikes END) >= 8 THEN 3
                WHEN (CASE WHEN cn >= pn THEN call_active_strikes ELSE put_active_strikes END) >= 5 THEN 2
                WHEN (CASE WHEN cn >= pn THEN call_active_strikes ELSE put_active_strikes END) >= 3 THEN 1
                ELSE 0 END
         + CASE WHEN (CASE WHEN cn >= pn THEN cu ELSE pu END)
                     > (CASE WHEN cn >= pn THEN pu ELSE cu END) * 2.0 THEN 2
                WHEN (CASE WHEN cn >= pn THEN cu ELSE pu END)
                     > (CASE WHEN cn >= pn THEN pu ELSE cu END) THEN 1
                ELSE 0 END) AS base_score
    FROM scored
),
counts AS (
    SELECT nation, direction, COUNT(*) AS cluster_size
    FROM laddered WHERE base_score >= 3
    GROUP BY nation, direction
)
SELECT
    l.suppkey,
    l.s_name,
    l.nation,
    l.region,
    l.direction,
    CAST(COALESCE(c.cluster_size, 0) AS BIGINT) AS cluster_size,
    CAST(CASE WHEN l.base_score >= 3 THEN
              CASE WHEN COALESCE(c.cluster_size, 0) >= 8 THEN 3
                   WHEN COALESCE(c.cluster_size, 0) >= 5 THEN 2
                   WHEN COALESCE(c.cluster_size, 0) >= 4 THEN 1
                   ELSE 0 END
         ELSE 0 END AS INT) AS cluster_boost,
    CAST(l.base_score AS INT) AS original_score,
    CAST(LEAST(GREATEST(l.base_score
              + CASE WHEN l.base_score >= 3 THEN
                     CASE WHEN COALESCE(c.cluster_size, 0) >= 8 THEN 3
                          WHEN COALESCE(c.cluster_size, 0) >= 5 THEN 2
                          WHEN COALESCE(c.cluster_size, 0) >= 4 THEN 1
                          ELSE 0 END
                ELSE 0 END, 0), 10) AS INT) AS score,
    ROUND(l.cn, 2) AS call_dollar_vol,
    ROUND(l.pn, 2) AS put_dollar_vol,
    CAST(l.call_active_strikes AS BIGINT) AS call_active_strikes,
    CAST(l.put_active_strikes AS BIGINT) AS put_active_strikes
FROM laddered l
LEFT JOIN counts c ON c.nation = l.nation AND c.direction = l.direction
ORDER BY score DESC, call_dollar_vol + put_dollar_vol DESC, suppkey ASC
LIMIT 10
"""


def scanner_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow metrics + score + dims for every entity (pre-ranking frame)."""
    li = t(spark, sf_dir, "lineitem")
    notional = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flow = side_flow_metrics(
        li,
        key="l_suppkey",
        side=F.col("l_linestatus"),
        call_side="O",
        notional=notional,
        volume=F.col("l_quantity"),
        strike_id=F.col("l_partkey"),
        active_threshold=F.lit(25.0),
        uoa_baseline=F.lit(30.0),
    )
    direction, score = flow_score(
        F.col("call_dollar_vol"),
        F.col("put_dollar_vol"),
        F.col("call_active_strikes"),
        F.col("put_active_strikes"),
        F.col("call_uoa_depth"),
        F.col("put_uoa_depth"),
    )
    dims = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )
    return (
        flow.withColumn("direction", direction)
        .withColumn("score", score)
        .join(F.broadcast(dims), flow["l_suppkey"] == dims["s_suppkey"])
        .drop("s_suppkey")
        .withColumnRenamed("l_suppkey", "suppkey")
    )


@query(
    "scanner_rank",
    oracle=_SCANNER_ORACLE,
    tags=("A1", "A2", "A3", "J1", "J2", "T1", "P2", "S1"),
)
def scanner_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full scanner pipeline → boosted scores → top-10."""
    scored = scanner_flow(spark, sf_dir)
    boosted = apply_cluster_boost(scored, ["nation", "direction"], score_col="score")
    return (
        boosted.select(
            "suppkey",
            "s_name",
            "nation",
            "region",
            "direction",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("cluster_boost").cast("int").alias("cluster_boost"),
            F.col("original_score").cast("int").alias("original_score"),
            F.col("score").cast("int").alias("score"),
            r2(F.coalesce("call_dollar_vol", F.lit(0.0))).alias("call_dollar_vol"),
            r2(F.coalesce("put_dollar_vol", F.lit(0.0))).alias("put_dollar_vol"),
            F.col("call_active_strikes").cast("long").alias("call_active_strikes"),
            F.col("put_active_strikes").cast("long").alias("put_active_strikes"),
        )
        .orderBy(
            F.desc("score"),
            F.desc(F.col("call_dollar_vol") + F.col("put_dollar_vol")),
            F.asc("suppkey"),
        )
        .limit(10)
    )
