"""Scalar / expression function library — the engine's public surface for
§2.8-style column algebra.

Layering: ``exprs`` holds the core scalar families (guarded math, tier
ladders, coalesce chains, rounding, contract formatting); the operator
modules contribute domain expression builders (text shingles/hashing,
embedding dot/norm kernels). This package is the single import point:

    from profitscout_engine_spark.functions import guarded_div, stable_round
"""

from ..exprs import (  # noqa: F401
    bucketize,
    clamp,
    coalesce_chain,
    contract_symbol,
    guarded_div,
    null_div,
    pct_change,
    r2,
    r4,
    r6,
    safe_double,
    stable_round,
    step_ladder,
    tier_ladder,
)
from ..operators.similarity import cosine, dot, l2_distance, norm, scalar_dot, scalar_norm  # noqa: F401
from ..operators.text import hamming, tokens, word_shingles  # noqa: F401
