"""Exactly-once streaming commits into the transactional table — the
bridge between Structured Streaming and the snapshot-commit layer
(sources/txn.py), i.e. streaming upsert with lakehouse semantics.

The contract: each micro-batch MERGEs into the versioned table as one
atomic snapshot commit. Exactly-once effect comes from the standard
replayable-source + idempotent-sink argument — Structured Streaming
replays a batch after a crash/restart, and re-merging the same rows by
key is a no-op on table CONTENT (versions advance, content is stable).
A committed-batch marker written after each commit short-circuits
replays cheaply; correctness never depends on it, because the marker
may be lost in the crash window and the merge is idempotent anyway.

Reference provenance (behavioral, not code): the reference's streaming
inserts land with best-effort retry and can double-write on crash
(win-tracker/main.py:333-348 batched patches); this is the shape that
makes re-delivery harmless.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..sources.txn import commit_snapshot, current_version, merge_upsert_txn

_MARKERS = "_committed_batches"


def stream_merge_to_txn(
    stream_df: DataFrame,
    root: str,
    keys: list[str],
    checkpoint: str,
    partition_col: str | None = None,
):
    """Return a started streaming query that MERGEs every micro-batch
    into the txn table at ``root`` (AvailableNow trigger). Each batch is
    one atomic snapshot commit; replayed batches are skipped via the
    marker (fast path) or absorbed by merge idempotency (crash path)."""
    marker_dir = os.path.join(root, _MARKERS)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"{batch_id:020d}")
        if os.path.exists(marker):
            return  # replay of an already-committed batch
        if current_version(root) == 0:
            # bootstrap: the first-ever batch IS the initial snapshot
            # (batch rows are key-unique per source contract, so this
            # equals merging into an empty table)
            commit_snapshot(batch_df, root, partition_col=partition_col)
        else:
            merge_upsert_txn(
                batch_df.sparkSession, root, batch_df, keys, partition_col=partition_col
            )
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w"):
            pass

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
