"""Aggregation operators (SURVEY §2.4 A2-A21, §2.7 U1, §2.5 W11).

Every aggregate is a single hash aggregation (map-side partial agg → one
shuffle of |groups| rows). Conditional aggregates use when()/FILTER instead
of pre-splitting the frame, so the fact table is scanned once.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..exprs import bucketize, r2, r4, tier_ladder
from ..operators.ranks import (
    exact_percentiles,
    group_key,
    grouped_exact_percentiles,
    percentile_literal_map,
)
from . import query
from ._oracle import exact_quantile_bounds_sql
from ._util import t


# --- A2+A3+A6+A21: conditional count/sum, win-rate with NULLIF guard ----------
@query(
    "conditional_aggregates",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(CASE WHEN l_quantity > 30 THEN 1 END) AS n_active,
           ROUND(SUM(CASE WHEN l_quantity > 30
                          THEN (l_quantity - 30) * l_extendedprice END), 2) AS uoa_depth,
           ROUND(AVG(CASE WHEN l_quantity > 30 THEN 1.0 ELSE 0.0 END), 4) AS active_rate,
           ROUND(SUM(l_extendedprice) / NULLIF(SUM(l_quantity), 0), 4) AS price_per_unit
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A2", "A3", "A6", "A21"),
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-strike counting + UOA depth + win-rate over a boolean, in one
    pass (overnight_scanner flow metrics / premium_eda win-rates)."""
    li = t(spark, sf_dir, "lineitem")
    active = F.col("l_quantity") > 30
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count(F.when(active, 1)).alias("n_active"),
        r2(F.sum(F.when(active, (F.col("l_quantity") - 30) * F.col("l_extendedprice")))).alias(
            "uoa_depth"
        ),
        r4(F.avg(F.when(active, 1.0).otherwise(0.0))).alias("active_rate"),
        r4(F.sum("l_extendedprice") / F.nullif(F.sum("l_quantity"), F.lit(0))).alias(
            "price_per_unit"
        ),
    )


# --- A4: argmin nearest-neighbor (ATM-IV pattern) -----------------------------
@query(
    "argmin_nearest",
    oracle="""
    WITH ranked AS (
        SELECT l_orderkey, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY ABS(l_quantity - 25), l_extendedprice,
                                           l_linenumber) AS rn
        FROM lineitem
    )
    SELECT l_orderkey, ROUND(l_extendedprice, 2) AS atm_price
    FROM ranked WHERE rn = 1
    """,
    tags=("A4",),
)
def argmin_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per group, value of the row nearest a target scalar — ``min_by`` over a
    composite ordering struct (one shuffle; no window sort)."""
    li = t(spark, sf_dir, "lineitem")
    ordering = F.struct(
        F.abs(F.col("l_quantity") - 25).alias("d"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_linenumber").alias("ln"),
    )
    return li.groupBy("l_orderkey").agg(
        r2(F.min_by(F.col("l_extendedprice"), ordering)).alias("atm_price")
    )


# --- A5: filtered argmax per group (best-contract selection) ------------------
@query(
    "best_contract",
    oracle="""
    WITH candidates AS (
        SELECT l_suppkey, l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) / GREATEST(l_quantity, 1.0) AS contract_score
        FROM lineitem
        WHERE l_quantity BETWEEN 7 AND 45 AND l_discount <= 0.08
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                     ORDER BY contract_score DESC,
                                              l_orderkey, l_linenumber) AS rn
        FROM candidates
    )
    SELECT l_suppkey, l_orderkey AS best_orderkey, l_linenumber AS best_linenumber,
           ROUND(contract_score, 4) AS contract_score
    FROM ranked WHERE rn = 1
    """,
    tags=("A5", "P2"),
)
def best_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate filters (DTE/spread-style) → score expr → top-1 per group via
    ``max_by`` on a composite struct (descending score, ascending keys)."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(7, 45) & (F.col("l_discount") <= 0.08)
    )
    score = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.greatest(F.col("l_quantity"), F.lit(1.0))
    )
    ordering = F.struct(
        score.alias("s"), (-F.col("l_orderkey")).alias("ok"), (-F.col("l_linenumber")).alias("ln")
    )
    return (
        li.withColumn("contract_score", score)
        .groupBy("l_suppkey")
        .agg(
            F.max_by(
                F.struct("l_orderkey", "l_linenumber", "contract_score"), ordering
            ).alias("best")
        )
        .select(
            "l_suppkey",
            F.col("best.l_orderkey").alias("best_orderkey"),
            F.col("best.l_linenumber").alias("best_linenumber"),
            r4(F.col("best.contract_score")).alias("contract_score"),
        )
    )


# --- A7: grouped agg on CASE-concat key + HAVING ------------------------------
@query(
    "pattern_combo_having",
    oracle="""
    SELECT CONCAT(o_orderstatus, '_',
                  CASE WHEN o_totalprice >= 200000 THEN 'BIG'
                       WHEN o_totalprice >= 100000 THEN 'MID'
                       ELSE 'SMALL' END) AS pattern,
           COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1
    HAVING COUNT(*) >= 3
    """,
    tags=("A7",),
)
def pattern_combo_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """premium_eda Query-4 shape: derived pattern label → groupBy → HAVING."""
    o = t(spark, sf_dir, "orders")
    pattern = F.concat(
        F.col("o_orderstatus"),
        F.lit("_"),
        F.when(F.col("o_totalprice") >= 200000, F.lit("BIG"))
        .when(F.col("o_totalprice") >= 100000, F.lit("MID"))
        .otherwise(F.lit("SMALL")),
    )
    return (
        o.groupBy(pattern.alias("pattern"))
        .agg(F.count("*").alias("n"), r2(F.avg("o_totalprice")).alias("avg_price"))
        .filter(F.col("n") >= 3)
    )


# --- A10+W11: value_counts + percent-of-total window --------------------------
@query(
    "value_counts_pct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 4) AS pct_of_total
    FROM events
    GROUP BY event_type
    """,
    tags=("A10", "W11"),
)
def value_counts_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-reason distribution with percent-of-total (premium_eda Query 5)."""
    counts = t(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("n"))
    return counts.select(
        "event_type",
        "n",
        r4(F.col("n") * 100.0 / F.sum("n").over(Window.partitionBy())).alias("pct_of_total"),
    )


# --- A11+A20: global ranges + rate normalization ------------------------------
@query(
    "date_span_rates",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           ROUND(COUNT(*) / GREATEST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                                     MAX(CAST(o_orderdate AS DATE))) / 30.0, 1.0), 4)
               AS orders_per_month,
           MIN(CAST(o_orderdate AS DATE)) AS first_order,
           MAX(CAST(o_orderdate AS DATE)) AS last_order
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    """,
    tags=("A11", "A20"),
)
def date_span_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trades/month = n / (span/30) normalization over a date range."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.min(d).alias("first_order"),
            F.max(d).alias("last_order"),
        )
        .filter(F.col("n_orders") >= 5)
        .select(
            "o_custkey",
            "n_orders",
            r4(
                F.col("n_orders")
                / F.greatest(
                    F.datediff(F.col("last_order"), F.col("first_order")) / F.lit(30.0),
                    F.lit(1.0),
                )
            ).alias("orders_per_month"),
            "first_order",
            "last_order",
        )
    )


# --- A12+A13: exact median/quantiles per group --------------------------------
@query(
    "group_quantiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_extendedprice), 4) AS med_price,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
           ROUND(AVG(l_extendedprice), 4) AS mean_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A12", "A13"),
)
def group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (loser-clustering q25/q75 thresholds; sweep median),
    computed via ``operators.ranks.grouped_exact_percentiles`` — distributed
    per-group order statistics with the quantile_cont interpolation tree —
    instead of the ``percentile()`` aggregate, whose per-group buffer holds
    EVERY value of the group: group keys here are bounded (3 flags) but the
    groups themselves grow with the data, the exact shape that OOMs at 100×
    (round-5 sweep of the equi_depth fix across the registry)."""
    li = t(spark, sf_dir, "lineitem")
    qs = grouped_exact_percentiles(
        li, ["l_returnflag"], "l_extendedprice", [0.5, 0.25, 0.75]
    )
    q = F.element_at(percentile_literal_map(qs), group_key("l_returnflag"))
    return (
        li.groupBy("l_returnflag")
        .agg(r4(F.avg("l_extendedprice")).alias("mean_price"))
        .select(
            "l_returnflag",
            r4(q[0]).alias("med_price"),
            r4(q[1]).alias("q25"),
            r4(q[2]).alias("q75"),
            "mean_price",
        )
    )


# --- A14: histogram bucketing (VIX buckets) -----------------------------------
@query(
    "histogram_buckets",
    oracle="""
    SELECT CASE WHEN value >= 0 AND value < 5 THEN 'calm'
                WHEN value >= 5 AND value < 10 THEN 'normal'
                WHEN value >= 10 AND value < 15 THEN 'elevated'
                WHEN value >= 15 AND value < 20 THEN 'high'
                WHEN value >= 20 AND value < 1e9 THEN 'extreme'
           END AS bucket,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    tags=("A14",),
)
def histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.cut-style right-open bins → groupBy bucket."""
    ev = t(spark, sf_dir, "events")
    bucket = bucketize(
        F.col("value"),
        [0, 5, 10, 15, 20, 1e9],
        ["calm", "normal", "elevated", "high", "extreme"],
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), r4(F.avg("value")).alias("avg_value")
    )


# --- A15: multi-metric sweep rollup -------------------------------------------
@query(
    "sweep_rollup",
    oracle="""
    SELECT l_returnflag AS cohort, l_linestatus AS scenario,
           COUNT(*) AS sample_size,
           ROUND(AVG(CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END), 4) AS win_rate,
           ROUND(AVG(CASE WHEN l_tax > 0.04 THEN 1.0 ELSE 0.0 END), 4) AS stop_rate,
           ROUND(AVG((l_extendedprice * (1 - l_discount) - l_extendedprice)
                     / l_extendedprice * 100), 4) AS expected_value,
           ROUND(median((l_extendedprice * (1 - l_discount) - l_extendedprice)
                        / l_extendedprice * 100), 4) AS median_return
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("A15", "A9"),
)
def sweep_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_sweep per-config rollup: n, win/stop rates, EV, median return.
    The per-config median comes from ``operators.ranks.
    grouped_exact_percentiles`` (distributed per-group order statistics)
    rather than a ``percentile()`` aggregate whose per-group buffer
    holds every return of the config — configs are bounded keys whose
    groups grow with the data (round-5 sweep of the 100× OOM shape)."""
    li = t(spark, sf_dir, "lineitem")
    ret = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("l_extendedprice"))
        / F.col("l_extendedprice")
        * 100
    )
    framed = li.withColumn("ret", ret)
    med = grouped_exact_percentiles(
        framed, ["l_returnflag", "l_linestatus"], "ret", [0.5]
    )
    med_map = percentile_literal_map(med, scalar=True)
    gkey = group_key("cohort", "scenario")
    return (
        framed
        .groupBy(F.col("l_returnflag").alias("cohort"), F.col("l_linestatus").alias("scenario"))
        .agg(
            F.count("*").alias("sample_size"),
            r4(F.avg(F.when(F.col("l_discount") > 0.05, 1.0).otherwise(0.0))).alias("win_rate"),
            r4(F.avg(F.when(F.col("l_tax") > 0.04, 1.0).otherwise(0.0))).alias("stop_rate"),
            r4(F.avg("ret")).alias("expected_value"),
        )
        .withColumn("median_return", r4(F.element_at(med_map, gkey)))
    )


# --- A16: consensus tally with level ladder + deterministic argmax ------------
@query(
    "consensus_tally",
    oracle="""
    WITH picks AS (
        SELECT o_orderpriority AS ticker, o_orderstatus AS direction,
               o_totalprice AS conviction, o_orderkey
        FROM orders WHERE o_totalprice >= 100000
    ),
    tally AS (
        SELECT ticker, direction,
               COUNT(*) AS votes,
               ROUND(AVG(conviction), 2) AS avg_conviction
        FROM picks GROUP BY 1, 2
    ),
    best AS (
        SELECT ticker, direction, o_orderkey AS best_pick,
               ROW_NUMBER() OVER (PARTITION BY ticker, direction
                                  ORDER BY conviction DESC, o_orderkey) AS rn
        FROM picks
    ),
    sized AS (
        SELECT t.*, b.best_pick,
               SUM(t.votes) OVER (PARTITION BY t.ticker) AS total_votes
        FROM tally t JOIN best b
          ON b.ticker = t.ticker AND b.direction = t.direction AND b.rn = 1
    )
    SELECT ticker, direction, votes, avg_conviction, best_pick,
           CASE WHEN votes = total_votes THEN 'unanimous'
                WHEN votes * 1.0 / total_votes >= 0.75 THEN 'supermajority'
                WHEN votes * 1.0 / total_votes > 0.5 THEN 'majority'
                ELSE 'split' END AS consensus_level
    FROM sized
    """,
    tags=("A16", "T7"),
)
def consensus_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agent-arena consensus: vote tally per (ticker, direction), avg
    conviction, highest-conviction pick (deterministic max_by), and a
    unanimous/supermajority/majority ladder on the vote share."""
    picks = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 100000)
        .select(
            F.col("o_orderpriority").alias("ticker"),
            F.col("o_orderstatus").alias("direction"),
            F.col("o_totalprice").alias("conviction"),
            "o_orderkey",
        )
    )
    tally = picks.groupBy("ticker", "direction").agg(
        F.count("*").alias("votes"),
        r2(F.avg("conviction")).alias("avg_conviction"),
        F.max_by(
            F.col("o_orderkey"),
            F.struct(F.col("conviction").alias("c"), (-F.col("o_orderkey")).alias("k")),
        ).alias("best_pick"),
    )
    total = F.sum("votes").over(Window.partitionBy("ticker"))
    share = F.col("votes") * 1.0 / F.col("total_votes")
    return (
        tally.withColumn("total_votes", total)
        .withColumn(
            "consensus_level",
            F.when(F.col("votes") == F.col("total_votes"), "unanimous")
            .when(share >= 0.75, "supermajority")
            .when(share > 0.5, "majority")
            .otherwise("split"),
        )
        .drop("total_votes")
    )


# --- A17: roll-up with sorted top-N id lists ----------------------------------
@query(
    "summary_top_lists",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           array_to_string(list_sort(list(doc_id))[1:10], ',') AS sample_docs
    FROM documents
    GROUP BY lang
    """,
    tags=("A17", "T6"),
)
def summary_top_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-summary shape: counts + first-10 ids per side. collect_list is
    order-nondeterministic, so the list is sorted before slicing."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10), ",").alias(
            "sample_docs"
        ),
    )


# --- A18 + tier ladder: outcome-tier tally ------------------------------------
@query(
    "tier_tally",
    oracle="""
    SELECT CASE WHEN pct >= 5 THEN 'strong_win'
                WHEN pct >= 3 THEN 'solid_win'
                WHEN pct >= 1 THEN 'directional_win'
                WHEN pct >= 0 THEN 'no_decision'
                ELSE 'loss' END AS tier,
           COUNT(*) AS n
    FROM (SELECT (l_quantity - 25) / 5.0 AS pct FROM lineitem)
    GROUP BY 1
    """,
    tags=("A18",),
)
def tier_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win-tracker tier classification ladder → tally (exhaustive over ℝ)."""
    li = t(spark, sf_dir, "lineitem").select(
        ((F.col("l_quantity") - 25) / 5.0).alias("pct")
    )
    tiers = tier_ladder(
        F.col("pct"),
        [(5.0, "strong_win"), (3.0, "solid_win"), (1.0, "directional_win"), (0.0, "no_decision")],
        "loss",
    )
    return li.groupBy(tiers.alias("tier")).agg(F.count("*").alias("n"))


# --- A19+U2: distinct ---------------------------------------------------------
@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    tags=("A19", "U2"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --- U1: UNION ALL of per-pattern aggregates ----------------------------------
@query(
    "union_all_patterns",
    oracle="""
    SELECT 'HEDGE' AS pattern, COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT 'HIGH_RR', COUNT(*), ROUND(AVG(o_totalprice), 2)
    FROM orders WHERE o_totalprice > 200000
    UNION ALL
    SELECT 'BULL_FLOW', COUNT(*), ROUND(AVG(o_totalprice), 2)
    FROM orders WHERE o_orderpriority LIKE '1%'
    UNION ALL
    SELECT 'BEAR_FLOW', COUNT(*), ROUND(AVG(o_totalprice), 2)
    FROM orders WHERE o_orderpriority LIKE '5%'
    UNION ALL
    SELECT 'HIGH_ATR', COUNT(*), ROUND(AVG(o_totalprice), 2)
    FROM orders WHERE o_orderstatus = 'O' AND o_totalprice < 50000
    """,
    tags=("U1",),
)
def union_all_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """premium_eda Query-2 shape: one aggregate per premium pattern, unioned.
    (The idiomatic single-pass alternative is conditional aggregation — kept
    as UNION ALL here to exercise the set operator.)"""
    o = t(spark, sf_dir, "orders")

    def one(label: str, cond) -> DataFrame:
        return o.filter(cond).agg(
            F.lit(label).alias("pattern"),
            F.count("*").alias("n"),
            r2(F.avg("o_totalprice")).alias("avg_price"),
        ).select("pattern", "n", "avg_price")

    parts = [
        one("HEDGE", F.col("o_orderstatus") == "F"),
        one("HIGH_RR", F.col("o_totalprice") > 200000),
        one("BULL_FLOW", F.col("o_orderpriority").startswith("1")),
        one("BEAR_FLOW", F.col("o_orderpriority").startswith("5")),
        one("HIGH_ATR", (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- scale-path sketches: approximate distinct + quantiles --------------------
# (SURVEY §2.4 notes the reference has no approximate aggregates; at 100 TB
# the exact forms (sort-based percentile, full COUNT DISTINCT shuffle) are
# the bottleneck, and the HLL/KLL sketches are the operators you actually
# run. Sketch internals differ across engines, so the ESTIMATE itself can't
# be value-hashed — instead each query exposes the error-bound INVARIANT the
# sketch guarantees as a checkable column (VERDICT r9 item 4): the oracle
# computes the exact statistic and asserts the bound held, so a sketch that
# ever strays past its published envelope goes red in the driver. Reference
# analog: scripts/tests_and_diagnostics/check_liquidity_stats.py:6-15 (the
# reference's own computed-vs-expected sanity-check pattern).
@query(
    "approx_distinct_sketch",
    oracle="""
    SELECT l_suppkey,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem GROUP BY l_suppkey
    """,
    tags=("A19", "approx"),
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct parts per supplier (rsd 2%) — one pass, fixed memory
    per group, vs the exact shuffle-dedup twin computed alongside.

    ``within_bound`` asserts |approx - exact| <= 4*rsd*exact + 2 (4σ of the
    configured relative standard deviation, plus an absolute slack of 2 for
    tiny groups where HLL++'s sparse mode quantizes). The oracle emits the
    exact count and a literal TRUE, so the driver hash-check FAILS the round
    the sketch ever exceeds its envelope — the strongest cross-engine
    statement possible for an implementation-defined estimator. The rsd is a
    target, NOT a published worst-case guarantee: the estimator is
    implementation-defined, so the envelope sits at 4σ (ADVICE r10 — 3σ was
    tight enough that a Spark upgrade could flip a group red without a real
    regression; at 4σ a breach means the sketch is genuinely out of spec).
    """
    li = t(spark, sf_dir, "lineitem")
    # Dedup FIRST, sketch second (guide §2.3 "shuffle fewer bytes"): the
    # mixed distinct+non-distinct form made Spark carry a
    # partial_approx_count_distinct buffer — 400+ HLL register words, ≈3 KB
    # per row — through the (suppkey, partkey) exchange, turning a 2-long
    # shuffle into a multi-GB one (plans/r11/approx_distinct_sketch_before
    # .txt, HashAggregate (2) Results [412]). HLL registers are max-folds of
    # per-VALUE hashes, so the sketch over the distinct (suppkey, partkey)
    # set is bit-identical to the sketch over the multiset; COUNT(*) on the
    # deduped set IS countDistinct. Same two exchanges, narrow rows, and the
    # HLL buffers now exist only per supplier in the second aggregation.
    dd = li.select("l_suppkey", "l_partkey").distinct()
    g = dd.groupBy("l_suppkey").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").cast("long").alias("exact_parts"),
    )
    bound = F.lit(4 * 0.02) * F.col("exact_parts") + F.lit(2.0)
    return g.select(
        "l_suppkey",
        "exact_parts",
        (F.abs(F.col("approx_parts") - F.col("exact_parts")) <= bound).alias(
            "within_bound"
        ),
    )


@query(
    "approx_quantile_sketch",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS b25, TRUE AS b50, TRUE AS b75
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("A13", "approx"),
)
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (accuracy 10k) per return flag — mergeable sketch,
    no per-group sort buffer — checked against its published rank guarantee.

    The Greenwald-Khanna contract: the returned value's exact rank is within
    n/accuracy of floor(q*n). With ties the value occupies the rank interval
    [cnt_lt+1, cnt_le], so ``b{q}`` asserts that interval intersects
    [q*n - tol, q*n + tol] with tol = n/accuracy + 1:
    cnt_lt <= q*n + tol AND cnt_le >= q*n - tol. The oracle emits literal
    TRUEs over the exact group counts — an out-of-envelope sketch
    hash-mismatches.
    """
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    q = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)"
        ).alias("q")
    )
    j = li.join(F.broadcast(q), "l_returnflag")
    g = j.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        *[
            agg.alias(f"{kind}{int(frac * 100)}")
            for i, frac in enumerate((0.25, 0.5, 0.75))
            for kind, agg in (
                ("lt", F.sum((F.col("l_extendedprice") < F.col("q")[i]).cast("long"))),
                ("le", F.sum((F.col("l_extendedprice") <= F.col("q")[i]).cast("long"))),
            )
        ],
    )
    tol = F.col("n_rows") / F.lit(10000.0) + F.lit(1.0)

    def bracket(frac: float, tag: int):
        target = F.col("n_rows") * F.lit(frac)
        return (
            (F.col(f"lt{tag}") <= target + tol) & (F.col(f"le{tag}") >= target - tol)
        ).alias(f"b{tag}")

    return g.select(
        "l_returnflag", "n_rows", bracket(0.25, 25), bracket(0.5, 50), bracket(0.75, 75)
    )


# --- §2.8: regime-switched weighted composite score ---------------------------
@query(
    "regime_weighted_score",
    oracle="""
    WITH m AS (
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS notional,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount) * 100, 4) AS avg_disc_pct,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_suppkey
    ),
    vix AS (SELECT ROUND(AVG(value), 4) AS vix_proxy FROM events)
    SELECT m.l_suppkey,
           CASE WHEN v.vix_proxy >= 10 THEN 'high_vol' ELSE 'calm' END AS regime,
           ROUND(CASE WHEN v.vix_proxy >= 10
                      THEN 0.2 * m.avg_qty + 0.5 * m.avg_disc_pct + 0.3 * LN(m.notional + 1)
                      ELSE 0.5 * m.avg_qty + 0.2 * m.avg_disc_pct + 0.3 * LN(m.notional + 1)
                 END, 4) AS composite_score
    FROM m CROSS JOIN vix v
    """,
    tags=("scalar-weighted", "A9"),
)
def regime_weighted_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regime-switched weighted composite (the reference's regime weight
    sets, src/enrichment/core/config.py:39-58 + enrichment-trigger
    main.py:539-545): a market-level scalar (global agg, broadcast as a
    1-row cross join) selects which weight vector scores every entity —
    weights as literals, the switch as one CASE, all codegen."""
    li = t(spark, sf_dir, "lineitem")
    m = li.groupBy("l_suppkey").agg(
        r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("notional"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.avg("l_discount") * 100).alias("avg_disc_pct"),
        F.count("*").alias("n"),
    )
    vix = t(spark, sf_dir, "events").agg(r4(F.avg("value")).alias("vix_proxy"))
    high = F.col("vix_proxy") >= 10
    score = F.when(
        high,
        0.2 * F.col("avg_qty") + 0.5 * F.col("avg_disc_pct") + 0.3 * F.log(F.col("notional") + 1),
    ).otherwise(
        0.5 * F.col("avg_qty") + 0.2 * F.col("avg_disc_pct") + 0.3 * F.log(F.col("notional") + 1)
    )
    return m.crossJoin(F.broadcast(vix)).select(
        "l_suppkey",
        F.when(high, "high_vol").otherwise("calm").alias("regime"),
        r4(score).alias("composite_score"),
    )


# --- CUBE: every grouping combination in one pass -----------------------------
@query(
    "cube_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("A-cube", "aggregation"),
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping combinations — (flag, status), (flag), (status),
    grand total — from ONE scan via CUBE; grouping_id disambiguates the
    superaggregate rows (NULL group values are labeled 'ALL').

    Scale shape: Spark expands each input row once per grouping set
    (4x) BEFORE the partial aggregation, so map-side combine still
    collapses to |distinct groups| rows per mapper and the shuffle
    carries only group rows — one pass, one exchange, versus four
    separate scans unioned.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "gid",
            "n",
            "revenue",
        )
    )


# --- PIVOT: long -> wide cross-tab with a fixed column universe ---------------
PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "pivot_lang_counts",
    oracle=f"""
    SELECT source,
           {", ".join(
               f"CAST(COUNT(CASE WHEN lang = '{lg}' THEN 1 END) AS BIGINT) AS n_{lg}"
               for lg in PIVOT_LANGS
           )},
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM documents
    GROUP BY source
    """,
    tags=("A-pivot", "aggregation", "textops"),
)
def pivot_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide cross-tab: per-source document counts pivoted over the
    FIXED language universe (explicit value list — the scale rule for
    pivot: never let the engine run a distinct-scan just to discover
    column names). Compiles to one conditional aggregation — same plan
    as the CASE-ladder oracle: one scan, one shuffle of |sources| rows.
    """
    d = t(spark, sf_dir, "documents")
    out = (
        d.groupBy("source")
        .pivot("lang", list(PIVOT_LANGS))
        .agg(F.count(F.lit(1)))
        .na.fill(0, [*PIVOT_LANGS])
    )
    total = [F.col(lg).cast("long") for lg in PIVOT_LANGS]
    agg_total = total[0]
    for c in total[1:]:
        agg_total = agg_total + c
    return out.select(
        "source",
        *[F.col(lg).cast("long").alias(f"n_{lg}") for lg in PIVOT_LANGS],
        agg_total.alias("n_total"),
    )


# --- A-unpivot: wide -> long (melt), the inverse of pivot ---------------------
@query(
    "unpivot_supplier_metrics",
    oracle="""
    WITH m AS (
        -- integral 1e-4 units before each sum: AVG's float accumulation is
        -- engine-order-specific and the 4dp round flips at 2x group sizes
        SELECT l_suppkey,
               ROUND(CAST(SUM(CAST(round(l_quantity * 10000E0) AS BIGINT))
                          AS BIGINT) / 10000E0 / COUNT(*), 4) AS avg_qty,
               ROUND(CAST(SUM(CAST(round(l_extendedprice * 10000E0) AS BIGINT))
                          AS BIGINT) / 10000E0 / COUNT(*), 4) AS avg_price,
               ROUND(CAST(SUM(CAST(round(l_discount * 10000E0) AS BIGINT))
                          AS BIGINT) / 10000E0 / COUNT(*), 4) AS avg_disc
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, 'avg_qty' AS metric, avg_qty AS value FROM m
    UNION ALL
    SELECT l_suppkey, 'avg_price', avg_price FROM m
    UNION ALL
    SELECT l_suppkey, 'avg_disc', avg_disc FROM m
    """,
    tags=("A-unpivot", "aggregation"),
)
def unpivot_supplier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt: per-supplier metric columns unpivoted to
    (entity, metric, value) rows — the tidy form the panel pipelines
    standardize on (one UNPIVOT generate, no join, no shuffle beyond
    the source aggregation; the oracle spells it as the equivalent
    UNION ALL, which Spark's unpivot replaces with a single pass).
    """
    li = t(spark, sf_dir, "lineitem")

    # integral 1e-4 units before each sum (2x-replica trap: AVG's float
    # accumulation order flips the 4dp round)
    def _avg4(col: str):
        s = F.sum(F.round(F.col(col) * 10000).cast("long"))
        return r4(s / F.lit(10000.0) / F.count(F.lit(1)))

    m = li.groupBy("l_suppkey").agg(
        _avg4("l_quantity").alias("avg_qty"),
        _avg4("l_extendedprice").alias("avg_price"),
        _avg4("l_discount").alias("avg_disc"),
    )
    return m.unpivot(
        ids=["l_suppkey"],
        values=["avg_qty", "avg_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- A-sweep: interval sweep-line (peak concurrency) --------------------------
@query(
    "interval_peak_load",
    oracle="""
    WITH b AS (
        SELECT event_type, ts AS bt, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 30 MINUTE AS bt, -1 AS delta FROM events
    ),
    load AS (
        SELECT event_type, bt,
               CAST(SUM(delta) OVER (PARTITION BY event_type ORDER BY bt, delta
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cur
        FROM b
    ),
    pk AS (SELECT event_type, MAX(cur) AS peak FROM load GROUP BY 1)
    SELECT l.event_type, p.peak AS peak_concurrency, MIN(l.bt) AS peak_at
    FROM load l JOIN pk p ON l.event_type = p.event_type AND l.cur = p.peak
    GROUP BY 1, 2
    """,
    tags=("A-sweep", "intervals"),
)
def interval_peak_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent-interval load per stream via the sweep-line trick:
    each event is a half-open [ts, ts+30min) interval; explode to ±1
    boundary rows, running-sum in (time, delta) order — ends sort before
    starts at the same instant, so touching intervals don't double-count
    — and take the per-group max with its earliest attainment time.
    This is THE scalable way to answer "how many sessions/trades/
    connections were open at once": O(n) rows, one window partition per
    stream, no interval self-join (the naive overlap join is O(n²) per
    group). Integer arithmetic end-to-end, so both engines agree
    bit-for-bit."""
    ev = t(spark, sf_dir, "events").select("event_type", "ts")
    b = ev.select(
        "event_type", F.col("ts").alias("bt"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("bt"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bt", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # peak via a second (unordered full-frame) window over the SAME
    # partitioning — Catalyst reuses the one exchange, so the boundary
    # union is scanned once (a join back to a groupBy'd copy would run
    # the whole union+cumsum twice).
    load = (
        b.withColumn("cur", F.sum("delta").over(w).cast("long"))
        .withColumn("peak", F.max("cur").over(Window.partitionBy("event_type")))
        .select("event_type", "bt", "cur", "peak")
    )
    return (
        load.where(F.col("cur") == F.col("peak"))
        .groupBy("event_type", F.col("peak").alias("peak_concurrency"))
        .agg(F.min("bt").alias("peak_at"))
        .select("event_type", "peak_concurrency", "peak_at")
    )


# --- scalar family: higher-order array functions ------------------------------
@query(
    "order_line_array_ops",
    oracle="""
    WITH a AS (
        SELECT l_orderkey,
               list_sort(list(CAST(l_quantity AS INT))) AS q
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(q) AS INT) AS n_lines,
           array_to_string(q, ',') AS qty_csv,
           CAST(list_aggregate(q, 'sum') AS BIGINT) AS total_qty,
           CAST(len(list_filter(q, x -> x >= 25)) AS INT) AS n_big,
           array_to_string(list_transform(q[1:3], x -> x * 2), ',') AS doubled_head
    FROM a
    """,
    tags=("scalar-array", "HOF"),
)
def order_line_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as first-class scalars: per-order
    line quantities collected to a SORTED array, then folded
    (``aggregate`` lambda), filtered (``filter`` lambda) and mapped
    (``transform`` lambda) without ever exploding back to rows — the
    §2.8 array family exercised end-to-end in whole-stage codegen, the
    way nested data should be processed at scale (explode→regroup costs
    a shuffle per operation; lambdas cost zero). Arrays serialize to
    CSV strings at the comparison boundary per repo convention."""
    li = t(spark, sf_dir, "lineitem")
    a = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("int"))).alias("q")
    )
    return a.select(
        "l_orderkey",
        F.size("q").alias("n_lines"),
        F.array_join(F.col("q"), ",").alias("qty_csv"),
        F.expr("aggregate(q, 0L, (acc, x) -> acc + x)").alias("total_qty"),
        F.size(F.expr("filter(q, x -> x >= 25)")).alias("n_big"),
        F.array_join(
            F.expr("transform(slice(q, 1, 3), x -> x * 2)"), ","
        ).alias("doubled_head"),
    )


# --- A-grouping-sets: multi-grain traffic rollup in one pass ------------------
@query(
    "grouping_sets_traffic",
    oracle="""
    SELECT COALESCE(event_type, 'ALL') AS etype,
           COALESCE(CAST(EXTRACT(HOUR FROM ts) AS BIGINT), -1) AS hr,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (EXTRACT(HOUR FROM ts)), ())
    """,
    tags=("A-grouping-sets", "aggregation"),
)
def grouping_sets_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the generalized form of cube/rollup (both already
    registered): per-type totals, per-hour-of-day totals, and the grand
    total in ONE aggregation pass. Spark plans this as a single Expand +
    hash aggregate — one scan, one shuffle — where three separate
    groupBys would scan three times; the same Expand strategy carries a
    1000-executor rollup fan-out. Group keys are non-null in the events
    fixture, so COALESCE sentinels ('ALL' / -1) are unambiguous grouping
    markers on both engines."""
    ev = t(spark, sf_dir, "events").withColumn("hr", F.hour("ts").cast("long"))
    return (
        ev.groupingSets(
            [[F.col("event_type")], [F.col("hr")], []],
            F.col("event_type"),
            F.col("hr"),
        )
        .agg(F.count("*").alias("n"), r2(F.sum("value")).alias("total_value"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("etype"),
            F.coalesce(F.col("hr"), F.lit(-1).cast("long")).alias("hr"),
            "n",
            "total_value",
        )
    )


# --- A-running-distinct: cumulative distinct users by day ---------------------
@query(
    "running_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, COUNT(*) AS new_users FROM first_seen GROUP BY d),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    SELECT days.d AS day,
           COALESCE(daily.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(daily.new_users, 0))
                OVER (ORDER BY days.d ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_users
    FROM days LEFT JOIN daily ON daily.d = days.d
    """,
    tags=("A-running-distinct", "W5", "streaming"),
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user curve — the growth metric every events
    warehouse reports. A naive COUNT(DISTINCT) OVER (ORDER BY day) holds
    every user id in window state; this plan is the scalable rewrite:
    distinct collapses to each user's FIRST-SEEN day (one shuffle on
    user_id), daily first-seen counts are a tiny aggregate, and the
    running sum is a window over #days rows — the only unpartitioned
    window, bounded by the calendar, not the data. Days with zero new
    users still appear (distinct-days spine, left join)."""
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    daily = first_seen.groupBy("d").agg(F.count("*").alias("new_users"))
    days = ev.select(F.to_date("ts").alias("d")).distinct()
    new_users = F.coalesce(F.col("new_users"), F.lit(0).cast("long"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(daily, "d", "left")
        .select(
            F.col("d").alias("day"),
            new_users.alias("new_users"),
            F.sum(new_users).over(w).alias("cumulative_users"),
        )
    )


# --- A-equidepth: CBO-style equi-depth histogram build ------------------------
EQUIDEPTH_BUCKETS = 10


@query(
    "equi_depth_histogram",
    oracle=f"""
    WITH {exact_quantile_bounds_sql("lineitem", "l_extendedprice",
                                    [(i + 1) / 10.0 for i in range(9)], "bounds")}
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(l_extendedprice), 2) AS lo,
           ROUND(MAX(l_extendedprice), 2) AS hi
    FROM (
        SELECT l_extendedprice,
               CAST(len(list_filter(bounds.qs, q -> q < l_extendedprice)) AS BIGINT)
                   AS bucket
        FROM lineitem, bounds
    )
    GROUP BY bucket
    """,
    tags=("A-equidepth", "A13", "aggregation"),
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram construction — the statistics object a
    cost-based optimizer keeps per column (Spark's own ANALYZE TABLE
    FOR COLUMNS builds exactly this). The 9 internal boundaries are
    EXACT interpolated percentiles, but NOT via the single-buffer
    ``percentile()`` aggregate (which holds the whole column in one
    aggregation buffer — an OOM at 100×): ``operators.ranks.
    exact_percentiles`` decomposes each percentile into two distributed
    order statistics (value-pure range buckets -> bounded per-bucket
    count frame -> within-bucket row_number) and interpolates with the
    same lo + (hi-lo)*frac formula both Spark's percentile and DuckDB's
    quantile_cont use, so the boundary doubles — and therefore every
    bucket assignment — stay bit-equal to the exact oracle. Each row
    then finds its bucket by counting boundary literals strictly below
    it (ties at boundaries land in the lower bucket on both engines
    because the comparison is strict). The single-buffer exact form
    survives as a differential twin in tests/test_ranks.py."""
    li = t(spark, sf_dir, "lineitem")
    probs = [(i + 1) / 10.0 for i in range(9)]
    bounds = exact_percentiles(li, "l_extendedprice", probs)
    bucket = functools.reduce(
        lambda acc, b: acc
        + F.when(F.lit(b) < F.col("l_extendedprice"), 1).otherwise(0),
        bounds,
        F.lit(0),
    )
    bucketed = li.select(
        "l_extendedprice", bucket.cast("long").alias("bucket")
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        r2(F.min("l_extendedprice")).alias("lo"),
        r2(F.max("l_extendedprice")).alias("hi"),
    )


# --- A/B experiment readout (deterministic assignment, closed-form stats) -----
@query(
    "ab_test_stats",
    oracle="""
    WITH assigned AS (
        SELECT event_type, value,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7')
                    THEN 'A' ELSE 'B' END AS arm
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS na,
               CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS nb,
               SUM(CASE WHEN arm = 'A' THEN value ELSE 0.0 END) AS sa,
               SUM(CASE WHEN arm = 'B' THEN value ELSE 0.0 END) AS sb,
               SUM(CASE WHEN arm = 'A' THEN value * value ELSE 0.0 END) AS qa,
               SUM(CASE WHEN arm = 'B' THEN value * value ELSE 0.0 END) AS qb
        FROM assigned GROUP BY event_type
    )
    SELECT event_type, na, nb,
           ROUND(sa / na, 4) AS mean_a,
           ROUND(sb / nb, 4) AS mean_b,
           ROUND(sb / nb - sa / na, 4) AS lift,
           ROUND((sb / nb - sa / na)
                 / sqrt((qa - sa * sa / na) / (na * (na - 1.0))
                        + (qb - sb * sb / nb) / (nb * (nb - 1.0))), 4) AS t_stat
    FROM m
    WHERE na >= 2 AND nb >= 2
    """,
    tags=("A9", "experiment", "aggregation"),
)
def ab_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — Welch-style mean lift and t-statistic per
    metric slice, with DETERMINISTIC md5 arm assignment (the hash_split
    convention: same user always lands in the same arm, on any engine,
    with no stored assignment table). One conditional-moment aggregation
    per slice yields both arms' count/sum/sumsq — a single fact scan,
    single shuffle; the t-statistic is closed-form arithmetic on those
    six numbers (sqrt is correctly-rounded IEEE, so both engines agree;
    no erf/p-value, which WOULD drift cross-engine — the consumer
    thresholds |t|). Under-powered slices (n < 2 in either arm) drop."""
    ev = t(spark, sf_dir, "events")
    arm_a = F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).isin(
        *"01234567"
    )
    a = lambda c: F.when(arm_a, c).otherwise(F.lit(0.0))  # noqa: E731
    b = lambda c: F.when(~arm_a, c).otherwise(F.lit(0.0))  # noqa: E731
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.when(arm_a, 1)).alias("na"),
        F.count(F.when(~arm_a, 1)).alias("nb"),
        F.sum(a(v)).alias("sa"),
        F.sum(b(v)).alias("sb"),
        F.sum(a(v * v)).alias("qa"),
        F.sum(b(v * v)).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb, qa, qb = F.col("sa"), F.col("sb"), F.col("qa"), F.col("qb")
    lift = sb / nb - sa / na
    se = F.sqrt(
        (qa - sa * sa / na) / (na * (na - F.lit(1.0)))
        + (qb - sb * sb / nb) / (nb * (nb - F.lit(1.0)))
    )
    return (
        m.where((na >= 2) & (nb >= 2))
        .select(
            "event_type",
            "na",
            "nb",
            r4(sa / na).alias("mean_a"),
            r4(sb / nb).alias("mean_b"),
            r4(lift).alias("lift"),
            r4(lift / se).alias("t_stat"),
        )
    )


# --- multi-touch attribution (first / last / linear) ---------------------------
ATTR_LOOKBACK_H = 24


@query(
    "multi_touch_attribution",
    oracle=f"""
    WITH purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id, value AS p_value
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS touch_type
        FROM events WHERE event_type IN ('view', 'click')
    ),
    joined AS (
        SELECT p.p_id, p.p_value, t.touch_type,
               ROW_NUMBER() OVER (PARTITION BY p.p_id ORDER BY t.t_ts, t.t_id) AS rk,
               COUNT(*) OVER (PARTITION BY p.p_id) AS n_touch
        FROM purchases p
        JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_ts >= p.p_ts - INTERVAL {ATTR_LOOKBACK_H} HOUR
         AND t.t_ts < p.p_ts
    ),
    weighted AS (
        SELECT touch_type, 'first_touch' AS model,
               CAST(FLOOR(p_value * 1e6 + 0.5) AS BIGINT) AS w_1e6
        FROM joined WHERE rk = 1
        UNION ALL
        SELECT touch_type, 'last_touch',
               CAST(FLOOR(p_value * 1e6 + 0.5) AS BIGINT)
        FROM joined WHERE rk = n_touch
        UNION ALL
        SELECT touch_type, 'linear',
               CAST(FLOOR(p_value / n_touch * 1e6 + 0.5) AS BIGINT)
        FROM joined
    )
    SELECT model, touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           ROUND(CAST(SUM(w_1e6) AS BIGINT) / 1e6, 2) AS attributed_value
    FROM weighted
    GROUP BY model, touch_type
    """,
    tags=("attribution", "J7", "A3"),
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution under three standard models —
    first-touch, last-touch, linear — over a 24 h lookback: each
    purchase joins its preceding view/click touchpoints (temporal range
    join on the user key), per-conversion touch ranks come from one
    window pass, and each model assigns its credit weights. Per-credit
    amounts are fixed to integral 1e-6 units BEFORE the cross-model
    rollup (float-sum order trap); ranks tie-break on (ts, event_id).
    Scale shape: the range join shuffles both sides on user_id once and
    AQE handles the per-user fan-out; the batch twin of the streaming
    interval-join attribution (click_attribution_stream) extended from
    last-touch to the full model family."""
    ev = t(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
    )
    tc = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
    )
    joined = p.join(
        tc,
        (p["user_id"] == tc["user_id"])
        & (tc["t_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {ATTR_LOOKBACK_H} HOURS"))
        & (tc["t_ts"] < p["p_ts"]),
    )
    w = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    ranked = joined.select(
        "p_id", "p_value", "touch_type",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("p_id")).alias("n_touch"),
    )
    fx = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")  # noqa: E731
    first = ranked.where(F.col("rk") == 1).select(
        "touch_type", F.lit("first_touch").alias("model"), fx(F.col("p_value")).alias("w")
    )
    last = ranked.where(F.col("rk") == F.col("n_touch")).select(
        "touch_type", F.lit("last_touch").alias("model"), fx(F.col("p_value")).alias("w")
    )
    linear = ranked.select(
        "touch_type", F.lit("linear").alias("model"),
        fx(F.col("p_value") / F.col("n_touch")).alias("w"),
    )
    return (
        first.unionByName(last).unionByName(linear)
        .groupBy("model", "touch_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            r2(F.sum("w") / F.lit(1e6)).alias("attributed_value"),
        )
    )


# --- Poisson-bootstrap confidence intervals ------------------------------------
# The scale-friendly bootstrap: classical resampling draws N indices per
# replica (a corpus-wide shuffle per replica); the Poisson bootstrap gives
# every ROW an independent Poisson(1) weight per replica — a map-only
# fan-out whose replica sums are one combinable aggregation, the form
# every large-scale experimentation platform uses. Draws come from md5
# uniforms through the Poisson(1) inverse-CDF ladder, so both engines
# (and reruns) produce identical replicas.
BOOT_R = 64  # replicas
# cumulative Poisson(1) CDF at k = 0..6, fixed 5dp-truncated constants —
# written with E0 exponents so both engines compare the same DOUBLEs.
_BOOT_CDF = ("0.36788", "0.73576", "0.91970", "0.98101", "0.99634", "0.99941", "0.99992")
BOOT_LO_RANK = 2  # ceil(0.025 * 64): type-1 2.5th percentile of replica means
BOOT_HI_RANK = 63  # ceil(0.975 * 64)


def _boot_w_sql(instr_fn: str, u: str) -> str:
    # Indicator SUM, not a CASE ladder: w = #thresholds at/below u. The
    # addends are evaluated unconditionally, so Spark's subexpression
    # elimination collapses the repeated md5-uniform to ONE evaluation —
    # a CASE ladder marks each branch conditional and re-derives u (and
    # its md5) per WHEN, which benched 5x slower at sf0.1.
    terms = " + ".join(
        f"CAST({u} >= {c}E0 AS INT)" for c in _BOOT_CDF
    )
    return f"({terms})"


def _boot_u_sql(instr_fn: str, key: str) -> str:
    h = f"md5(concat('bs|', {key}))"
    hx = lambda i: f"({instr_fn}('0123456789abcdef', substr({h}, {i}, 1)) - 1)"
    val = " + ".join(f"CAST({16 ** (7 - i)} AS BIGINT) * {hx(i + 1)}" for i in range(8))
    return f"((({val}) + 0.5E0) / 4294967296E0)"


def _boot_oracle() -> str:
    key = "CAST(r AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)"
    u = _boot_u_sql("strpos", key)
    w = _boot_w_sql("strpos", u)
    return f"""
    WITH fanned AS (
        SELECT e.event_type, e.event_id, r.r,
               CAST(FLOOR(e.value * 1e6 + 0.5) AS BIGINT) AS vfix,
               {w} AS w
        FROM events e CROSS JOIN (SELECT i AS r FROM UNNEST(range(0, {BOOT_R})) AS u(i)) r
    ),
    reps AS (
        SELECT event_type, r,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * vfix) AS BIGINT) AS svf
        FROM fanned GROUP BY 1, 2
    ),
    means AS (
        SELECT event_type, r, svf / (NULLIF(sw, 0) * 1e6) AS m,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY svf / (NULLIF(sw, 0) * 1e6), r) AS rk
        FROM reps
    ),
    ci AS (
        SELECT event_type,
               MAX(CASE WHEN rk = {BOOT_LO_RANK} THEN m END) AS lo,
               MAX(CASE WHEN rk = {BOOT_HI_RANK} THEN m END) AS hi
        FROM means GROUP BY 1
    ),
    pt AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sv
        FROM events GROUP BY 1
    )
    SELECT p.event_type, p.n_events,
           ROUND(p.sv / (p.n_events * 1e6), 4) AS point_mean,
           ROUND(c.lo, 4) AS ci_lo,
           ROUND(c.hi, 4) AS ci_hi
    FROM pt p JOIN ci c ON c.event_type = p.event_type
    """


@query("bootstrap_ci_poisson", oracle=_boot_oracle(), tags=("experiment", "bootstrap", "A9"))
def bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type mean with a 95% Poisson-bootstrap confidence
    interval: BOOT_R replicas, each row weighted Poisson(1) per replica
    (md5 inverse-CDF draw — no RNG, no index resampling, no per-replica
    shuffle of the corpus), replica means ranked and read at the type-1
    2.5/97.5 percentile ranks with replica-id tie-breaks. Values fix to
    1e-6-unit BIGINTs before the weighted sums, so every replica sum is
    exact integer arithmetic and arrival order cannot matter; floats
    appear only in the final per-replica division. Plan: one 64×
    fan-out of narrow rows into a map-side-combinable aggregation —
    cost is R × scan, the canonical distributed-bootstrap budget."""
    key = "CAST(r AS STRING) || '|' || CAST(event_id AS STRING)"
    u = _boot_u_sql("instr", key)
    w = _boot_w_sql("instr", u)
    from ._util import fan_out

    # fan_out before the 64x explode: the single-split fixture scan would
    # otherwise run the whole replica fan-out (and its md5 draws) on one
    # task — the explode-side twin of the copurchase_pairs rule.
    ev = fan_out(spark, t(spark, sf_dir, "events")).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("vfix"),
    )
    fanned = ev.select(
        "event_type",
        "event_id",
        "vfix",
        F.explode(F.expr(f"sequence(0, {BOOT_R - 1})")).alias("r"),
    ).withColumn("w", F.expr(w))
    reps = fanned.groupBy("event_type", "r").agg(
        F.sum("w").cast("long").alias("sw"),
        F.sum(F.col("w") * F.col("vfix")).cast("long").alias("svf"),
    )
    m = F.col("svf") / (F.nullif(F.col("sw"), F.lit(0)) * F.lit(1e6))
    wnd = Window.partitionBy("event_type").orderBy(m.asc(), F.col("r").asc())
    means = reps.withColumn("rk", F.row_number().over(wnd)).withColumn("m", m)
    ci = means.groupBy("event_type").agg(
        F.max(F.when(F.col("rk") == BOOT_LO_RANK, F.col("m"))).alias("lo"),
        F.max(F.when(F.col("rk") == BOOT_HI_RANK, F.col("m"))).alias("hi"),
    )
    pt = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("vfix").cast("long").alias("sv"),
    )
    return pt.join(ci, "event_type").select(
        "event_type",
        "n_events",
        r4(F.col("sv") / (F.col("n_events") * F.lit(1e6))).alias("point_mean"),
        r4(F.col("lo")).alias("ci_lo"),
        r4(F.col("hi")).alias("ci_hi"),
    )


# --- weighted median: quantity-weighted typical price per return flag ----------
@query(
    "weighted_median_price",
    oracle="""
    WITH base AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem
    ),
    tot AS (
        SELECT flag, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(w) AS BIGINT) AS total_qty
        FROM base GROUP BY 1
    ),
    grp AS (
        SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS cw FROM base GROUP BY 1, 2
    ),
    run AS (
        SELECT flag, cents,
               CAST(SUM(cw) OVER (PARTITION BY flag ORDER BY cents) AS BIGINT)
                   AS rc
        FROM grp
    )
    SELECT run.flag AS l_returnflag, n_items, total_qty,
           ROUND(MIN(cents) / 100.0E0, 2) AS wmedian_price
    FROM run JOIN tot USING (flag)
    WHERE 2 * rc >= total_qty
    GROUP BY 1, 2, 3
    """,
    tags=("A12", "A13", "weighted-median"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per return flag — the robust
    'typical traded price' statistic (each line votes with its quantity,
    so a few huge-quantity cheap lines outweigh many tiny expensive
    ones). Weighted medians have NO built-in aggregate in either engine;
    the engine side is ``operators.ranks.grouped_weighted_median`` — the
    range-bucketed decomposition (per-(group,bucket) weight sums locate
    the crossing bucket; one RANGE-framed running weight inside only
    that slice), never a per-group sort or value buffer. Prices are
    integer CENTS before any comparison (fixed-point rule) and the lower
    weighted median is an order statistic, so the result is exact on
    both engines. The per-group totals are one hash aggregation; the
    medians come back as |groups| driver literals (bounded: return flags)."""
    from ..operators.ranks import grouped_weighted_median

    base = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    med = grouped_weighted_median(base, ["flag"], "cents", "w")
    mmap = F.create_map(
        *[x for (flag,), c in med.items() for x in (F.lit(flag), F.lit(c))]
    ) if med else F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<bigint>")
    )
    return (
        base.groupBy("flag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("w").cast("long").alias("total_qty"),
        )
        .select(
            F.col("flag").alias("l_returnflag"),
            "n_items",
            "total_qty",
            r2(F.element_at(mmap, F.col("flag")) / F.lit(100.0)).alias(
                "wmedian_price"
            ),
        )
    )
