"""Physical-plan inspection & quality gates.

The 100 TB design rules, written as assertions over Catalyst's formatted
output: filters/projections must reach the parquet scan, small dims must
broadcast, pair generators must never cartesian-product, Python must stay
out of hot paths. Used by tests/test_plans.py and runnable standalone:

    python -m profitscout_engine_spark.plans.report
"""

from __future__ import annotations

import contextlib
import io
import threading

from pyspark.sql import DataFrame

# Capture calls mutate the session-global maxPlanStringLength; concurrent
# captures (or an action racing a capture) could interleave save/restore and
# strand the cap at 2^31-16, silently re-enabling full per-action plan
# rendering for the rest of the session (ADVICE r11). One capture at a time.
_EXPLAIN_LOCK = threading.Lock()


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode)`` as a string.

    Lifts ``spark.sql.maxPlanStringLength`` for the duration of the call:
    the session caps it (see session.py — per-action plan rendering for the
    SQL-listener event is pure overhead on giant shared-frame trees), but
    every plan GATE flows through this function and must see the complete,
    untruncated plan — a silently truncated capture would turn the flag
    snapshot and the plan-sha operator-edit detector into no-ops."""
    spark = df.sparkSession
    key = "spark.sql.maxPlanStringLength"
    with _EXPLAIN_LOCK:
        try:
            old = spark.conf.get(key)
        except Exception:
            old = None
        spark.conf.set(key, str(2**31 - 16))
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode)
            return buf.getvalue()
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def pushed_filters(plan: str) -> str:
    """The PushedFilters line of the first scan in a formatted plan."""
    if "PushedFilters:" not in plan:
        return ""
    return plan.split("PushedFilters:")[1].split("\n")[0].strip()


def read_schema(plan: str) -> str:
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:")[1].split("\n")[0].strip()


def normalized_plan_sha(plan: str) -> str:
    """Content hash of a formatted plan with the session-dependent noise
    stripped — expression ids (#NN, a global counter), plan/subquery ids,
    object addresses, and tmp-dir paths (mkdtemp differs per process) —
    so the SAME logical+physical plan hashes identically across sessions.
    This is the operator-edit detector behind DRIVER_STATE.json: a change
    inside an operator (e.g. a percentile interpolation rule) shifts the
    expression tree and therefore this hash, even when the query's own
    source and its plan FLAGS are unchanged."""
    import hashlib
    import re

    s = re.sub(r"#\d+", "#", plan)
    s = re.sub(r"\b(?:plan_id|id|exprId|cteId|statsId)=\d+", "id=", s)
    s = re.sub(r"@[0-9a-f]{6,}", "@", s)
    s = re.sub(r"/tmp/\S+", "/tmp/_", s)
    s = re.sub(r"/spark-warehouse/\S+", "/spark-warehouse/_", s)
    # RDD ids are a session-global counter: a createDataFrame scan renders
    # as "MapPartitionsRDD[6]" in a fresh session and "[99]" after other
    # queries planned first — pure session-order noise (bit round 8: 11
    # phantom stale-green flags after a re-chunked snapshot run)
    s = re.sub(r"RDD\[\d+\]", "RDD[_]", s)
    # Round-11 noise class: CollapseProject's common-subexpression aliases
    # (_common_expr_N) draw N from a session-global counter just like
    # exprIds — the same plan renders _common_expr_0 in a fresh session and
    # _common_expr_16 after other queries planned first (bit round 11:
    # crawl_budget_allocator flipped sha between the full chunked snapshot
    # and a solo worker with byte-identical code).
    s = re.sub(r"_common_expr_\d+", "_common_expr_", s)
    # Round-10 noise class: iterative builds (localCheckpoint loops) leave
    # MATERIALIZED AQE query stages in the final plan, whose rendered
    # Statistics(sizeInBytes=…, rowCount=…) are runtime MEASUREMENTS, not
    # operator structure — shuffle byte sizes vary with codec buffering and
    # session history (bit round 10: k_core_peel's sha flipped between
    # snapshot runs with byte-identical code). Stage ids are counters too.
    # Statistics renderings can nest one paren level (ColumnStat details);
    # the old [^)]* stopped at the first ')' and left a dangling unparsed
    # tail that still flipped shas (ADVICE r10). One nesting level handled.
    s = re.sub(r"Statistics\((?:[^()]|\([^()]*\))*\)", "Statistics(_)", s)
    s = re.sub(r"QueryStage \(\d+\)", "QueryStage (_)", s)
    # Round-10 noise class: RewriteDistinctAggregates orders the per-column
    # distinct groups of its Expand by exprId-dependent hash order, so a
    # multi-distinct plan renders its (otherwise identical) expand/keys/
    # partitioning column lists in session-order-dependent order — the
    # same query hashed differently depending on which queries planned
    # earlier in the worker (bit round 10: table_profile/enrichment_pipeline
    # flipped sha between chunkings with byte-identical code). Canonicalize
    # ONLY the lines carrying the expand's gid column, at the GROUP level
    # (ADVICE r10 — the r10 token-multiset flatten erased bracket structure
    # and column-to-group pairing): each bracketed list sorts its COMMA-
    # SEPARATED ELEMENTS (paren-aware, nested brackets canonicalized first
    # and kept intact as single elements), so an expand group like
    # [suppkey#, null, 0] survives as a unit and only the session-order-
    # dependent ORDERING of groups/columns is erased. Adding/removing/
    # renaming a distinct column, or re-pairing a column to a different
    # group, still shifts the hash.
    # …and the gid VALUES themselves are assigned to distinct columns in
    # exprId-hash order, so `[1, l_tax#, null…]` in one session is
    # `[1, l_quantity#, null…]` in another and every
    # `FILTER (WHERE (gid# = N))` pairs N with a different function (bit
    # round 11: table_profile flipped sha with byte-identical code even
    # after group-level sorting). Erase integer literals on gid-carrying
    # lines BEFORE canonicalizing, so groups differing only in gid
    # numbering collapse; the function names and column multisets still
    # pin the operator structure.
    s = "\n".join(
        _canon_bracket_groups(re.sub(r"\b\d+\b", "_", line))
        if "gid#" in line
        else line
        # split("\n"), NOT splitlines(): the latter drops a trailing
        # newline and would shift the hash of every gid-free plan too
        for line in s.split("\n")
    )
    return hashlib.sha256(s.encode()).hexdigest()


def _canon_bracket_groups(line: str) -> str:
    """Order-free canonical form of one plan line: every ``[...]`` AND
    ``(...)`` group sorts its top-level comma-separated elements (the
    noise class covers bracketed expand/key lists and paren-rendered
    ``hashpartitioning(a#, gid#, 32)`` alike). Nested groups recurse
    first, then ride along as single (already-canonical) elements of
    their parent — so an expand group like ``[suppkey#, null, 0]``
    survives as an intact unit inside the outer group list."""
    closer = {"[": "]", "(": ")"}

    def parse(s: str, i: int, opener: str) -> tuple[str, int]:
        # i points just past the opener; returns (canonical group, next i)
        close = closer[opener]
        elems: list[str] = []
        cur: list[str] = []
        while i < len(s):
            ch = s[i]
            if ch in closer:
                inner, i = parse(s, i + 1, ch)
                cur.append(inner)
            elif ch == close:
                elems.append("".join(cur).strip())
                return (
                    opener + ", ".join(sorted(e for e in elems if e)) + close,
                    i + 1,
                )
            elif ch == ",":
                elems.append("".join(cur).strip())
                cur = []
                i += 1
            else:
                cur.append(ch)
                i += 1
        # unbalanced opener — keep what we have, order-free
        elems.append("".join(cur).strip())
        return opener + ", ".join(sorted(e for e in elems if e)) + close, i

    out: list[str] = []
    i = 0
    while i < len(line):
        if line[i] in closer:
            seg, i = parse(line, i + 1, line[i])
            out.append(seg)
        else:
            out.append(line[i])
            i += 1
    return "".join(out)


def count_unpartitioned_windows(plan: str) -> int:
    """Window nodes whose spec has NO partition columns — every row of the
    input funnels through one task. Legitimate ONLY over provably bounded
    frames (a calendar day spine, a ≤num_buckets bucket table, a literal
    lag spine); on a data-sized frame it is the single-task sort this
    engine's ranks/scan operators exist to kill. Detection: in the
    formatted node details, a Window's Arguments render as
    ``[exprs], [partition], [order]`` when partitioned and
    ``[exprs], [order]`` when not; a two-group spec whose second group
    carries sort directions is therefore unpartitioned (a partition-only
    spec has no ASC/DESC there)."""
    import re

    n = 0
    # exactly the Window/WindowInPandas execs — NOT WindowGroupLimit, whose
    # argument list has a different shape (part, order, fn, k, mode) and
    # which is a pushed-down LIMIT, not a windowed computation
    for m in re.finditer(
        r"^\(\d+\) Window(?:InPandas)?\s*\n(?:(?!\(\d+\) ).*\n?)*", plan, re.M
    ):
        block = m.group(0)
        am = re.search(r"^Arguments: (.*)$", block, re.M)
        if not am:
            continue
        args = am.group(1)
        groups = args.count("], [") + 1
        if groups == 2:
            second = args.rsplit("], [", 1)[-1]
            if " ASC" in second or " DESC" in second:
                n += 1
        elif groups < 2:
            n += 1
    return n


def plan_flags(df: DataFrame) -> dict[str, bool | int]:
    """Structural quality signals for one query plan."""
    plan = explain_str(df)
    return {
        "pushed_filters": "PushedFilters: []" not in plan and "PushedFilters:" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": "CartesianProduct" in plan,
        "bnl_join": "BroadcastNestedLoopJoin" in plan,
        # row-at-a-time Python: always a defect in this engine
        "python_eval": "BatchEvalPython" in plan,
        # vectorized Arrow scalar hop: allowed only for declared kernels
        "arrow_eval": "ArrowEvalPython" in plan,
        "pandas_groups": "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan,
        "exchanges": plan.count("Exchange"),
        # allowed only over provably bounded frames — gated by the
        # _UNPART_WINDOW_OK allowlist in tests/test_plans.py
        "unpartitioned_windows": count_unpartitioned_windows(plan),
    }
