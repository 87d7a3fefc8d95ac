"""Skew mitigation: salted aggregation and salted joins.

At 100 TB the hot keys (SPY-sized tickers, stop-shingles, empty-string
buckets) overwhelm single reducers. AQE's skew-join splitting handles
sort-merge joins at runtime; salting is the portable, plan-level fix that
also covers aggregations:

- ``salted_aggregate``: two-phase decomposable aggregation — partials on
  (key, salt), final re-combine on key. The hot key's rows spread over
  ``buckets`` reducers in phase 1; phase 2 touches ``buckets`` rows per
  key, not the raw row count.
- ``salted_join``: the probe side is salted with a deterministic hash,
  the (small, hot-key-heavy) build side is replicated once per salt
  bucket; the equi-join on (key, salt) spreads each hot key across
  ``buckets`` tasks. Result is row-for-row identical to the unsalted
  join for inner/left joins only — for right/full/anti joins every
  unmatched build replica would survive once per bucket, so those
  shapes are rejected.

Salts are ``xxhash64``-derived (never ``rand()``): task retries and
partition changes reproduce the same assignment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def _salt_col(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of the whole row (no RNG)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count: str | None = None,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
    buckets: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT/MIN/MAX aggregation immune to key skew.

    Phase 1 groups on (keys…, salt) — partial per bucket; phase 2 folds
    the ≤``buckets`` partials per key. Only decomposable aggregates are
    offered because only they re-combine losslessly.
    """
    partial_aggs = (
        [F.sum(c).alias(f"_s_{c}") for c in sums]
        + ([F.count("*").alias("_cnt")] if count else [])
        + [F.min(c).alias(f"_mn_{c}") for c in mins]
        + [F.max(c).alias(f"_mx_{c}") for c in maxs]
    )
    final_aggs = (
        [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums]
        + ([F.sum("_cnt").alias(count)] if count else [])
        + [F.min(f"_mn_{c}").alias(f"min_{c}") for c in mins]
        + [F.max(f"_mx_{c}").alias(f"max_{c}") for c in maxs]
    )
    partial = (
        df.withColumn(SALT, _salt_col(df, buckets))
        .groupBy(*keys, SALT)
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the probe's hot keys spread across salt buckets.

    ``build`` (the smaller relation) is exploded ×``buckets``; ``probe``
    rows get one deterministic salt each; joining on (key, salt) yields
    exactly the unsalted join's rows while no reducer sees more than
    ~1/``buckets`` of any key.

    Only ``inner``/``left`` are row-identical to the unsalted join: an
    unmatched build row exists ``buckets`` times after replication, so a
    right/full outer (or anti) join would emit it once per salt bucket.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):  # see docstring
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): replicated "
            "unmatched build rows would duplicate under right/full/anti joins"
        )
    salted_probe = probe.withColumn(SALT, _salt_col(probe, buckets))
    replicated = build.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = salted_probe.join(replicated, on=[on, SALT], how=how)
    return joined.drop(SALT)


def skewsafe_pair_gen(
    posting: DataFrame,
    key: str,
    id_col: str,
    hot_df: int = 64,
    buckets: int = 8,
) -> DataFrame:
    """Inverted-index self-pair generation immune to hot-key skew.

    Input: a posting list (key, id), set-semantics. Output: one (d1, d2)
    row per key the pair shares, d1 < d2 — exactly the rows of the naive
    ``a JOIN b ON a.key = b.key AND a.id < b.id`` self-join, so a
    downstream ``groupBy(d1, d2).count()`` yields intersection sizes.

    Differential salting: keys are first tagged with their document
    frequency (one extra shuffle — the same key-shuffle the join needs
    anyway). Keys at or below ``hot_df`` join plainly; hotter keys join
    on (key, salt) with the probe side salted by id-hash and the build
    side replicated ×``buckets``, so a stop-shingle's quadratic pair
    fan-out spreads over ``buckets`` reducers instead of melting one.
    Inner-join-only by construction, hence row-identical to the naive
    form for any input.
    """
    df_counts = posting.groupBy(key).agg(F.count("*").alias("_df"))
    # persist: the tagged posting list feeds FOUR join branches (a/b ×
    # cold/hot); without it each branch re-executes the posting-list
    # producer (for shingle input: the whole tokenize+explode pipeline).
    tagged = posting.join(df_counts, key).persist()
    a = tagged.select(key, "_df", F.col(id_col).alias("d1"))
    b = tagged.select(key, "_df", F.col(id_col).alias("d2"))
    lt = F.col("d1") < F.col("d2")
    cold = (
        a.where(F.col("_df") <= hot_df)
        .drop("_df")
        .join(b.where(F.col("_df") <= hot_df).drop("_df"), key)
        .where(lt)
    )
    hot_a = (
        a.where(F.col("_df") > hot_df)
        .drop("_df")
        .withColumn(SALT, F.pmod(F.xxhash64("d1"), F.lit(buckets)))
    )
    hot_b = (
        b.where(F.col("_df") > hot_df)
        .drop("_df")
        .withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    )
    hot = hot_a.join(hot_b, [key, SALT]).where(lt).drop(SALT)
    return cold.select("d1", "d2").unionByName(hot.select("d1", "d2"))


def skewsafe_directed_pairs(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_id: str,
    build_id: str,
    hot_size: int = 256,
    buckets: int = 8,
) -> DataFrame:
    """Directed candidate generation ``probe ⋈ build ON key`` immune to hot
    inverted lists — the IVF-search shape, where a popular coarse centroid
    would otherwise make one reducer score |list|² pairs.

    Differential salting mirrors :func:`skewsafe_pair_gen`: lists are
    tagged with their BUILD-side size (one count on the shuffle the join
    needs anyway). Lists at or below ``hot_size`` join plainly; hotter
    lists join on (key, salt) — probe rows salted by id-hash, build rows
    replicated ×``buckets`` — so a hot list's pair fan-out spreads over
    ``buckets`` tasks. Emits (probe_id, build_id) with probe_id ≠
    build_id, row-identical to the naive join for any input (inner joins
    only, both branches disjoint by the size tag).
    """
    sizes = build.groupBy(key).agg(F.count("*").alias("_lsz"))
    p = probe.select(key, F.col(probe_id).alias("_pid")).join(sizes, key)
    b = build.select(key, F.col(build_id).alias("_bid")).join(sizes, key)
    neq = F.col("_pid") != F.col("_bid")
    cold = (
        p.where(F.col("_lsz") <= hot_size)
        .drop("_lsz")
        .join(b.where(F.col("_lsz") <= hot_size).drop("_lsz"), key)
        .where(neq)
    )
    hot_p = (
        p.where(F.col("_lsz") > hot_size)
        .drop("_lsz")
        .withColumn(SALT, F.pmod(F.xxhash64("_pid"), F.lit(buckets)))
    )
    hot_b = (
        b.where(F.col("_lsz") > hot_size)
        .drop("_lsz")
        .withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    )
    hot = hot_p.join(hot_b, [key, SALT]).where(neq).drop(SALT)
    return (
        cold.select(F.col("_pid").alias(probe_id), F.col("_bid").alias(build_id))
        .unionByName(hot.select(F.col("_pid").alias(probe_id), F.col("_bid").alias(build_id)))
    )
