"""Mechanized stale-green gate (VERDICT r6 item 2).

DRIVER_STATE.json stamps each query's last GREEN driver/sweep verification
with a content hash of (normalized plan + function source + oracle SQL).
This test fails whenever a query's current hash differs from its stamped
hash and the query is not queued in _WINDOW_FRONT for re-verification —
the exact process gap that VERDICT r5 item 3 and r6 item 1 each caught by
hand: an edit landing AFTER a green driver row, silently un-verifying it.

On failure: either add the named query to _WINDOW_FRONT (it will get a
fresh driver row next round) or revert the unintended edit. After a new
CORRECTNESS_r{N}.json lands, re-stamp: ``python driver_state.py --stamp N``
(and ``python plans_snapshot.py`` first if plans changed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_no_silent_stale_greens():
    import driver_state

    problems = driver_state.check()
    assert not problems, "\n".join(problems)


def test_state_covers_every_query():
    """Every registered query is either stamped or queued in the window —
    a new query must enter _WINDOW_FRONT (or be swept and stamped) before
    it can leave the gate's sight."""
    import driver_state
    from profitscout_engine_spark.queries import _WINDOW_FRONT, load_registry

    state = driver_state.load_state()
    uncovered = sorted(
        set(load_registry()) - set(state) - set(_WINDOW_FRONT)
    )
    assert not uncovered, f"queries neither stamped nor windowed: {uncovered}"
