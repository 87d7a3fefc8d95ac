"""Transactional table commits over vanilla Parquet — the version-pointer
protocol that upgrades S11 MERGE (reference win-tracker/main.py:608-635
semantics) from read-join-overwrite to an ATOMIC snapshot swap.

Delta/Iceberg are not installable in this container (SURVEY §4), so this
module implements the essential lakehouse commit primitive directly:

    root/
      _CURRENT          <- tiny text file naming the live snapshot
      v_00000001/       <- immutable parquet snapshot dirs
      v_00000002/

- Writers stage a COMPLETE new snapshot directory, then flip ``_CURRENT``
  with an atomic ``os.replace`` (POSIX rename atomicity). A crash at any
  earlier point leaves the pointer — and therefore every reader — on the
  old snapshot; there is no partially-visible state, unlike
  ``mode("overwrite")`` which deletes before it writes.
- Readers resolve the pointer at plan time, so a query sees ONE snapshot
  end-to-end (snapshot isolation), and old snapshots remain readable by
  version number (time travel) until vacuumed.
- Commits carry optimistic concurrency: a writer states the version it
  read; if the pointer moved, the commit raises instead of clobbering
  the other writer (last-writer-wins corruption is the failure mode this
  prevents).

On an object store the same protocol runs with the pointer in a
conditional-put object (or a lakehouse catalog); the snapshot layout and
reader behavior are unchanged. Only the POINTER needs atomicity — the
data files are immutable once staged, which is exactly why this scales:
a 1000-executor job writes the snapshot in parallel, and commit itself
is one metadata operation.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_CURRENT"

# Spark/Hive escape these characters in partition directory names
# (ExternalCatalogUtils.escapePathName): ASCII control chars plus the
# shell/URI-special set, each written as %XX uppercase hex.
_ESCAPE_CHARS = frozenset('"#%\'*/:=?\\{[]^\x7f') | frozenset(chr(c) for c in range(1, 32))
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


class ConcurrentCommitError(RuntimeError):
    """The table advanced past the version this writer based its work on."""


def _escape_partition_value(v) -> str:
    """The directory-name form Spark's writer gives partition value ``v``:
    NULL and empty string become ``__HIVE_DEFAULT_PARTITION__``; every
    other value is stringified then Hive-escaped (':' -> '%3A' etc.) —
    mirroring ExternalCatalogUtils.getPartitionPathString so commit-time
    bookkeeping recognizes exactly the dirs the writer produced."""
    if v is None:
        return _HIVE_DEFAULT_PARTITION
    if isinstance(v, bool):  # Spark casts booleans to 'true'/'false'
        s = "true" if v else "false"
    else:
        s = str(v)
    if s == "":
        return _HIVE_DEFAULT_PARTITION
    return "".join(f"%{ord(c):02X}" if c in _ESCAPE_CHARS else c for c in s)


def _partition_filter(partition_col: str, touched: list):
    """NULL-aware membership test: plain ``isin`` never matches NULL, so a
    touched NULL partition needs an explicit ``isNull`` arm."""
    non_null = [v for v in touched if v is not None]
    cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in touched):
        cond = cond | F.col(partition_col).isNull()
    return cond


def _pointer_path(root: str) -> str:
    return os.path.join(root, _POINTER)


def current_version(root: str) -> int:
    """The live snapshot number, or 0 for an empty/new table."""
    try:
        with open(_pointer_path(root)) as f:
            return int(f.read().strip().split("_")[-1])
    except FileNotFoundError:
        return 0


def snapshot_path(root: str, version: int) -> str:
    return os.path.join(root, f"v_{version:08d}")


def read_versioned(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the live snapshot (or a pinned historical ``version``).

    The pointer is resolved HERE, once — the returned plan scans one
    immutable directory, so concurrent commits never tear a query.
    """
    v = current_version(root) if version is None else version
    if v == 0:
        raise FileNotFoundError(f"versioned table {root!r} has no committed snapshot")
    return spark.read.parquet(snapshot_path(root, v))


def commit_snapshot(
    df: DataFrame,
    root: str,
    expected_version: int | None = None,
    partition_col: str | None = None,
) -> int:
    """Write ``df`` as the table's next snapshot and atomically publish it.

    ``expected_version`` enables optimistic concurrency: pass the version
    your read was based on, and the commit fails (raising
    :class:`ConcurrentCommitError`, staged files cleaned up) if another
    writer advanced the table meanwhile. ``None`` skips the check
    (blind overwrite semantics — S9 truncate-load). ``partition_col``
    writes the snapshot hive-partitioned, which is what unlocks
    partition-pruned merges (see :func:`merge_upsert_txn`).

    Returns the committed version number.
    """
    os.makedirs(root, exist_ok=True)
    base = current_version(root)
    if expected_version is not None and base != expected_version:
        raise ConcurrentCommitError(
            f"table {root!r} is at v{base}, commit was based on v{expected_version}"
        )
    new_v = base + 1
    final = snapshot_path(root, new_v)
    staging = f"{final}__staging_{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_col is not None:
        w = w.partitionBy(partition_col)
    w.parquet(staging)

    # Re-check-and-flip. A true CAS needs a lock/conditional-put; plain
    # POSIX gives us: the pointer flip itself is atomic (os.replace), and
    # the window between this check and the flip is the residual race —
    # documented, and closed for real deployments by the object-store
    # conditional put this call maps onto.
    if expected_version is not None and current_version(root) != expected_version:
        shutil.rmtree(staging, ignore_errors=True)
        raise ConcurrentCommitError(
            f"table {root!r} advanced during staging (expected v{expected_version})"
        )
    # A crash between a previous commit's rename and its pointer flip leaves
    # an orphaned v_{new_v} dir; it was never referenced by the pointer, so
    # it is invisible to readers and safe to clear (otherwise this rename
    # fails ENOTEMPTY and wedges the table).
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(staging, final)
    tmp_ptr = _pointer_path(root) + f".tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp_ptr, "w") as f:
        f.write(f"v_{new_v:08d}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, _pointer_path(root))  # the atomic publish
    return new_v


def _merge_frames(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """The S11 row semantics: full outer join on keys; matched rows take
    COALESCE(source, target) for non-key columns, unmatched pass through."""
    src = source.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"_s_{c}") for c in source.columns if c not in keys],
    )
    cond = [F.col(k) == F.col(f"_k_{k}") for k in keys]
    joined = target.join(src, on=cond, how="full")
    merged_cols = []
    for c in target.columns:
        if c in keys:
            merged_cols.append(F.coalesce(F.col(c), F.col(f"_k_{c}")).alias(c))
        elif f"_s_{c}" in joined.columns:
            merged_cols.append(F.coalesce(F.col(f"_s_{c}"), F.col(c)).alias(c))
        else:
            merged_cols.append(F.col(c))
    return joined.select(*merged_cols)


def merge_upsert_txn(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
) -> int:
    """S11 MERGE with lakehouse semantics: WHEN MATCHED update non-key
    columns to COALESCE(source, target), WHEN NOT MATCHED insert — same
    row semantics as :func:`io.merge_upsert`, but committed as an atomic
    snapshot: readers see the pre-merge or post-merge table, never the
    torn middle, and a crash mid-merge changes nothing.

    Without ``partition_col`` the whole table rewrites into the new
    snapshot (one full outer join on the keys). WITH ``partition_col``
    (which must also be the snapshot's hive-partition column) commit
    cost scales with the TOUCHED data: only partitions containing
    source keys are read, merged, and rewritten; every untouched
    partition is HARD-LINKED file-by-file into the new snapshot dir —
    a metadata operation, no data copied, safe precisely because
    snapshot files are immutable. This is the 100 TB shape: merging one
    day into a year-partitioned table stages one day, links the rest.

    Pruning is only sound when a key cannot move between partitions. With
    ``partition_col`` in ``keys`` that holds by construction. Otherwise a
    source row could match a target row living in an UNTOUCHED partition
    (which would be hard-linked through unchanged while the source row
    inserts — duplicate keys), so this function first probes the
    untouched partitions for cross-partition key matches (a read-only
    key-column semi-join, scan pruned to the key columns) and falls back
    to the full-table merge when any exist.
    """
    base = current_version(root)
    target = read_versioned(spark, root)
    if partition_col is None:
        return commit_snapshot(_merge_frames(target, source, keys), root, expected_version=base)

    touched = [r[0] for r in source.select(partition_col).distinct().collect()]
    part_cond = _partition_filter(partition_col, touched)
    if partition_col not in keys:
        crossers = (
            target.where(~F.coalesce(part_cond, F.lit(False)))
            .select(*keys)
            .join(source.select(*keys).distinct(), on=keys, how="left_semi")
        )
        if crossers.limit(1).count() > 0:
            return commit_snapshot(
                _merge_frames(target, source, keys),
                root,
                expected_version=base,
                partition_col=partition_col,
            )
    merged = _merge_frames(target.where(part_cond), source, keys)
    return _commit_partition_delta(merged, root, base, partition_col, touched)


def delete_where_txn(
    spark: SparkSession,
    root: str,
    condition,
    partition_col: str | None = None,
) -> int:
    """Transactional DELETE — the right-to-be-forgotten / contamination
    purge a training-data table needs: rows matching ``condition`` (a
    Column or SQL string) vanish in one atomic snapshot flip; every
    prior snapshot still holds them until :func:`vacuum` (which is the
    actual erasure step — document retention accordingly).

    With ``partition_col``, only partitions that CONTAIN matching rows
    are rewritten; the rest hard-link into the new snapshot, so a
    targeted delete from a 100 TB table costs the touched partitions
    plus one metadata pass.
    """
    cond = F.expr(condition) if isinstance(condition, str) else condition
    # SQL DELETE removes only rows where the predicate is TRUE; a NULL
    # predicate keeps the row. ``~cond`` alone would also drop NULLs
    # (and do so only in rewritten partitions, making the outcome depend
    # on partition co-location), so fold NULL to FALSE before negating.
    keep_cond = ~F.coalesce(cond, F.lit(False))
    base = current_version(root)
    target = read_versioned(spark, root)
    if partition_col is None:
        return commit_snapshot(target.where(keep_cond), root, expected_version=base)
    touched = [
        r[0] for r in target.where(cond).select(partition_col).distinct().collect()
    ]
    kept = target.where(_partition_filter(partition_col, touched)).where(keep_cond)
    return _commit_partition_delta(kept, root, base, partition_col, touched)


def _commit_partition_delta(
    new_touched: DataFrame, root: str, base: int, partition_col: str, touched: list
) -> int:
    """Stage rewritten partitions + hard-link the untouched ones from the
    base snapshot, then atomically publish — the shared commit path for
    partition-pruned MERGE/DELETE."""
    new_v = base + 1
    final = snapshot_path(root, new_v)
    staging = f"{final}__staging_{uuid.uuid4().hex[:8]}"
    # Rewritten (touched) partitions land under their hive dirs.
    new_touched.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    # Untouched partitions: hard-link every file from the base snapshot.
    # A base dir is linked only if (a) its writer-escaped name is not a
    # touched value (covers touched partitions the rewrite EMPTIED — no
    # staging dir exists, but linking would resurrect purged rows) and
    # (b) it is not already present in staging (belt-and-braces: the
    # writer names touched dirs with the same escaping, so an escaping
    # divergence can never duplicate a rewritten partition).
    base_dir = snapshot_path(root, base)
    touched_dirs = {f"{partition_col}={_escape_partition_value(v)}" for v in touched}
    for entry in os.listdir(base_dir):
        src_dir = os.path.join(base_dir, entry)
        if not os.path.isdir(src_dir) or not entry.startswith(f"{partition_col}="):
            continue
        if entry in touched_dirs or os.path.isdir(os.path.join(staging, entry)):
            continue
        dst_dir = os.path.join(staging, entry)
        os.makedirs(dst_dir, exist_ok=True)
        for fname in os.listdir(src_dir):
            if fname.endswith(".parquet"):
                os.link(os.path.join(src_dir, fname), os.path.join(dst_dir, fname))

    if current_version(root) != base:
        shutil.rmtree(staging, ignore_errors=True)
        raise ConcurrentCommitError(f"table {root!r} advanced during staging (expected v{base})")
    if os.path.exists(final):  # orphan from a crash between rename and flip
        shutil.rmtree(final)
    os.rename(staging, final)
    tmp_ptr = _pointer_path(root) + f".tmp_{uuid.uuid4().hex[:8]}"
    with open(tmp_ptr, "w") as f:
        f.write(f"v_{new_v:08d}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, _pointer_path(root))
    return new_v


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 << 20,
    zorder_cols: list[str] | None = None,
    expected_version: int | None = None,
) -> tuple[int, int, int]:
    """Small-file compaction for the versioned table — the OPTIMIZE
    maintenance op (lakehouse bin-packing; reference's staging tables
    accumulate one file per micro-append, load_to_staging pattern).

    Rewrites the LIVE snapshot's rows into ``ceil(bytes/target)`` files
    and publishes the result as a new version through the same atomic
    commit path as any write — readers pinned to prior versions are
    untouched (time travel intact), and optimistic concurrency applies:
    a writer that lands between our read and the pointer flip fails the
    compaction cleanly instead of losing its rows. Row identity is
    bit-preserved (same rows, new layout) — pinned by the table-checksum
    test. ``zorder_cols`` routes the rewrite through the Morton-curve
    layout (:func:`..sources.io.zorder_layout`) so compaction doubles as
    multi-dimensional data-skipping maintenance; otherwise a round-robin
    repartition balances file sizes exactly.

    Returns ``(new_version, files_before, files_after)``.
    """
    import math

    from .io import zorder_layout

    base = current_version(root)
    if expected_version is not None and base != expected_version:
        raise ConcurrentCommitError(
            f"table {root!r} is at v{base}, compaction planned at v{expected_version}"
        )
    live = snapshot_path(root, base)
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(live)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total / target_file_bytes))
    df = read_versioned(spark, root, base)
    if zorder_cols:
        df = zorder_layout(df, zorder_cols, n_target)
    else:
        df = df.repartition(n_target)
    new_v = commit_snapshot(df, root, expected_version=base)
    new_files = [
        f
        for dp, _, fs in os.walk(snapshot_path(root, new_v))
        for f in fs
        if f.endswith(".parquet")
    ]
    return new_v, len(files), len(new_files)


def vacuum(root: str, keep: int = 2) -> list[int]:
    """Drop snapshot dirs older than the newest ``keep`` versions
    (never the live one). Returns the removed version numbers."""
    live = current_version(root)
    versions = sorted(
        int(d.split("_")[-1])
        for d in os.listdir(root)
        if d.startswith("v_") and "__staging" not in d
    )
    victims = [v for v in versions[:-keep] if v != live] if keep > 0 else []
    for v in victims:
        shutil.rmtree(snapshot_path(root, v), ignore_errors=True)
    return victims
