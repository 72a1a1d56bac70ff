"""Key-based upsert (MERGE) into a parquet table.

The reference's incremental ingest skips files it has already
processed via a boto3 head_object check
(/root/reference/bronze-to-silver.py:49-54); SURVEY.md §2.1 S15 notes
the engine-level replacements: the streaming checkpoint
(streaming/ingest.py) for append-only ingest, and MERGE for true
upserts. Plain parquet has no transaction log, so this implements the
classic swap pattern:

    survivors = target LEFT ANTI updates (null-safe, on keys)
    new table = survivors UNION updates
    write to a staging dir, then swap directories

Crash safety: the outgoing data is MOVED ASIDE (``__retired``), never
deleted before the incoming swap lands, and every call first runs a
recovery sweep that restores any aside left by a crashed predecessor —
so no crash point loses committed rows. The swap is atomic only
against readers that re-list the directory (documented limitation,
fine for batch jobs); partitioned merges swap per touched partition,
so a reader listing DURING the swap can see some partitions old and
some new.

Scale: cost is one anti-join shuffle of the touched rows + a rewrite
of the touched data — with ``partition_by`` the read is pruned to and
the rewrite REPLACES only partitions present in the updates (true
dynamic partition overwrite: untouched partition directories are never
read, rewritten, or moved). On Delta/Iceberg the same call maps to a
native MERGE INTO, which additionally gets file-skipping on the join
and a real transaction.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _data_dirs(root: str) -> list[str]:
    """Relative paths of directories under ``root`` that directly hold
    parquet files — "" for an unpartitioned table's root, else the
    Hive partition leaf dirs exactly as Spark spelled them (so NULL
    partition values, URL-escaping, and multi-level layouts need no
    re-derivation here)."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            rel = os.path.relpath(dirpath, root)
            out.append("" if rel == "." else rel)
    return out


def _recover(target_path: str) -> None:
    """Heal a crashed predecessor: restore any retired data whose
    replacement never landed, then clear leftovers. Idempotent."""
    retired = target_path + "__retired"
    staging = target_path + "__staging"
    if os.path.isdir(retired):
        for rel in _data_dirs(retired):
            src = os.path.join(retired, rel) if rel else retired
            dst = os.path.join(target_path, rel) if rel else target_path
            if not os.path.exists(dst):  # died mid-swap: roll back
                if rel:
                    os.makedirs(os.path.dirname(dst) or target_path,
                                exist_ok=True)
                os.replace(src, dst)
        shutil.rmtree(retired, ignore_errors=True)
    if os.path.isdir(staging):  # incomplete write from a crashed run
        shutil.rmtree(staging)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_path``:
    rows whose key matches are replaced (null-safely — a NULL key is a
    key like any other), new keys are appended. Creates the table if
    absent. An updates batch with DUPLICATE keys is rejected up front
    (same contract as txmerge.merge_into / scd.scd2_apply: each
    duplicate would survive the merge as two rows per key).

    With ``partition_by``, partition columns MUST be functionally
    dependent on the merge keys (or part of them): the rewrite prunes
    to partitions present in the updates, so an update that *moves* a
    key to a different partition value would leave the stale row alive
    in the untouched partition. The update side of that contract is
    asserted here (each key maps to one partition tuple within
    ``updates``); the target side is the caller's schema contract —
    same as Delta/Iceberg MERGE with partition-pruning hints."""
    keys = list(keys)
    target_path = target_path.rstrip("/")
    _recover(target_path)
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count():
        raise ValueError(
            "merge_upsert: updates batch has duplicate merge keys — "
            "both rows would land in the merged table"
        )
    staging = target_path + "__staging"
    retired = target_path + "__retired"
    exists = os.path.exists(target_path)
    if partition_by and exists:
        # the pruned rewrite's correctness precondition, checked
        # against the TARGET (the duplicate-key guard above already
        # makes partition tuples unique per key WITHIN the batch): an
        # update that moves a key to a different partition value would
        # leave the stale row alive in the untouched partition. The
        # check scans only the key+partition columns (column-pruned).
        overlap = [c for c in partition_by if c not in keys]
        if overlap:
            tgt = spark.read.parquet(target_path).select(*keys, *overlap)
            u = updates.select(
                *[F.col(k).alias(f"__u_{k}") for k in keys],
                *[F.col(c).alias(f"__u_{c}") for c in overlap],
            )
            kcond = None
            for k in keys:
                eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
                kcond = eq if kcond is None else (kcond & eq)
            same_part = None
            for c in overlap:
                eq = F.col(c).eqNullSafe(F.col(f"__u_{c}"))
                same_part = eq if same_part is None else (same_part & eq)
            moved = tgt.join(u, kcond & ~same_part, "inner")
            if moved.limit(1).count():
                raise ValueError(
                    "merge_upsert: partition columns "
                    f"{overlap} are not functionally dependent on keys "
                    f"{keys} — an update moves a key to a different "
                    "partition value, and a partition-pruned merge "
                    "would leave the stale row alive"
                )
    if exists:
        target = spark.read.parquet(target_path)
        if partition_by:
            # touch only partitions the updates contain — null-safe,
            # so a NULL partition value prunes in its target partition
            # like any other (its survivors must reach the staging
            # write, because the swap below replaces that whole dir)
            parts = F.broadcast(
                updates.select(
                    *[
                        F.col(c).alias(f"__p_{c}")
                        for c in partition_by
                    ]
                ).distinct()
            )
            pcond = None
            for c in partition_by:
                eq = F.col(c).eqNullSafe(F.col(f"__p_{c}"))
                pcond = eq if pcond is None else (pcond & eq)
            target = target.join(parts, pcond, "left_semi")
        # null-safe anti-join: a target row with a NULL key must be
        # REPLACED by a NULL-key update, not survive alongside it
        u_keys = updates.select(
            *[F.col(k).alias(f"__u_{k}") for k in keys]
        )
        cond = None
        for k in keys:
            eq = F.col(k).eqNullSafe(F.col(f"__u_{k}"))
            cond = eq if cond is None else (cond & eq)
        survivors = target.join(u_keys, cond, "left_anti")
        merged = survivors.unionByName(updates)
    else:
        merged = updates
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    if not exists:
        os.replace(staging, target_path)
        return
    if not partition_by:
        # whole-table swap: aside first (recoverable), delete last
        os.replace(target_path, retired)
        os.replace(staging, target_path)
        shutil.rmtree(retired, ignore_errors=True)
        return
    # dynamic partition overwrite: swap only the partition dirs the
    # staging write produced; untouched partitions are never moved
    os.makedirs(retired, exist_ok=True)
    for rel in _data_dirs(staging):
        src = os.path.join(staging, rel)
        dst = os.path.join(target_path, rel)
        if os.path.exists(dst):
            aside = os.path.join(retired, rel)
            os.makedirs(os.path.dirname(aside) or retired, exist_ok=True)
            os.replace(dst, aside)
        else:
            os.makedirs(os.path.dirname(dst) or target_path, exist_ok=True)
        os.replace(src, dst)
    shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
