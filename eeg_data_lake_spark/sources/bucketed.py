"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the key. Bucketing pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-splits every file by key, and a join of two
tables bucketed on the same key with the same bucket count reads
bucket i against bucket i — zero exchanges at query time (asserted in
tests/test_bucketed.py via the plan inspector). This is the parquet
analogue of the reference's repartition-before-write alignment
(/root/reference/main/combine_files.py:78) taken to its conclusion:
align the *storage*, not just one write, with the join key.

Bucketed tables require the session catalog (saveAsTable) rather than
path-based writes — Spark records bucket metadata in the catalog.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


#: Dropped into every directory this writer creates, so the orphan
#: reclaim below can prove a wedging directory is OURS before deleting
#: it. Underscore-prefixed → invisible to Spark's file readers.
MARKER_FILE = "_WRITTEN_BY_EEG_DATA_LAKE_SPARK"


def _location_claimed(spark: SparkSession, target: str) -> bool:
    """True if any table KNOWN TO THIS CATALOG lives at ``target`` —
    such a directory must never be reclaimed as an orphan."""
    import os
    from urllib.parse import urlparse

    from pyspark.errors import AnalysisException

    for db in spark.catalog.listDatabases():
        for tb in spark.catalog.listTables(db.name):
            qual = (
                tb.name
                if tb.namespace is None or not tb.namespace
                else ".".join([*tb.namespace, tb.name])
            )
            try:
                loc = urlparse(
                    spark.sql(f"DESCRIBE TABLE EXTENDED {qual}")
                    .filter("col_name = 'Location'")
                    .collect()[0][1]
                ).path
            except (AnalysisException, IndexError):
                # the two EXPECTED shapes: DESCRIBE refuses (temp
                # view / dropped-under-us) or no Location row (views).
                # Anything else propagates — a table whose location we
                # cannot determine must not silently lose protection.
                continue
            if os.path.normpath(loc) == os.path.normpath(target):
                return True
    return False


def reclaim_orphan_location(spark: SparkSession, table: str) -> None:
    """Clear an ORPHANED warehouse directory at ``table``'s managed
    location (a previous session wrote the files, then died before/
    without persisting the catalog entry — the catalog here is
    session-scoped). Such a directory wedges saveAsTable AND ALTER
    TABLE RENAME with LOCATION_ALREADY_EXISTS forever; files with no
    catalog entry are unreachable garbage, reclaim them.
    Guard rails: (a) qualified names resolve to the metastore layout
    ({db}.db/{tbl}), not a literal '{db}.{tbl}' dir that would miss
    and leave the wedge; (b) a directory any table KNOWN TO THIS
    CATALOG lives in is never touched; (c) rmtree is reserved for
    directories carrying the MARKER_FILE this writer drops — i.e.
    provably OUR orphan. A wedging directory WITHOUT the marker (some
    other process's data at our name) is renamed aside instead, so
    the caller's write can proceed but nothing foreign is ever
    destroyed."""
    import os
    import shutil
    import uuid
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        parts = table.lower().split(".")
        if len(parts) == 1 or parts[0] == "default":
            target = os.path.join(wh.path, parts[-1])
        else:
            target = os.path.join(wh.path, f"{parts[0]}.db", parts[1])
        # common case: no orphan dir — skip the catalog-wide
        # location scan entirely
        if os.path.isdir(target) and not _location_claimed(
            spark, target
        ):
            if os.path.exists(os.path.join(target, MARKER_FILE)):
                shutil.rmtree(target, ignore_errors=True)
            else:
                # NB: directories this writer created BEFORE the
                # marker existed look foreign too — they are moved
                # aside (never deleted) and accumulate until
                # someone inspects them. That is the deliberate
                # one-time migration cost: provenance cannot be
                # proven retroactively, and guessing wrong once
                # destroys someone else's data forever.
                aside = f"{target}.foreign-{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(target, aside)
                except OSError as exc:
                    # permissions, concurrent removal, cross-device
                    # warehouse path: surface a decision the caller
                    # can act on, not a bare errno from deep inside
                    # a write
                    raise RuntimeError(
                        f"bucketed table {table!r}: an unmarked "
                        f"directory is wedging its location "
                        f"{target} and could not be moved aside "
                        f"({exc}); inspect and remove it manually, "
                        f"then retry the write"
                    ) from exc
                import warnings

                warnings.warn(
                    f"bucketed table {table!r}: unmarked directory "
                    f"was wedging its location; moved aside to "
                    f"{aside} (inspect/delete manually)",
                    stacklevel=2,
                )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) on ``bucket_cols`` — sorted buckets let a sort-merge join
    skip its sort as well as its shuffle.

    The repartition below is load-bearing: without it every input
    partition writes its own file per bucket it touches (P×B small
    files), and Spark only trusts a bucket's sortBy metadata when the
    bucket is a single file — multi-file buckets silently re-insert
    the sort this writer exists to elide."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        reclaim_orphan_location(spark, table)
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)
    # stamp the directory as ours so a FUTURE session's orphan reclaim
    # (above) can prove provenance before rmtree'ing it
    import os
    from urllib.parse import urlparse

    try:
        loc = urlparse(
            spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            .filter("col_name = 'Location'")
            .collect()[0][1]
        )
        if loc.scheme in ("", "file"):
            with open(os.path.join(loc.path, MARKER_FILE), "w"):
                pass
    except (IndexError, OSError):
        pass  # non-local or location-less table: marker is best-effort


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key; with
    matching bucket specs Catalyst plans this with no exchange."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), list(on)
    )
