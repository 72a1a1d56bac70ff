"""Publish txlog snapshots as plain parquet for foreign readers —
the engine's analog of Delta's ``GENERATE symlink_format_manifest``:
downstream consumers (DuckDB, pandas, another Spark without this
package) get an ordinary parquet directory, while the publisher keeps
transactional semantics on its side.

Protocol (manifest-last, object-store safe):

1. the snapshot's rows are written to ``dest/snapshot-v<version>-<id>/``
   as normal (optionally Hive-partitioned) parquet;
2. ``dest/_published.json`` is then swapped in atomically (tmp +
   rename) naming that directory, the source version, and the row
   count. Readers resolve the manifest first, so a half-written
   snapshot directory is invisible until its manifest lands, and a
   re-publish never mutates files a concurrent reader may hold open —
   it writes a NEW directory and swaps the pointer.

``prune_published`` deletes unreferenced snapshot directories (the
vacuum step); keep one old generation if long-running readers need a
grace window.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from eeg_data_lake_spark.sources.txlog import TxTable

MANIFEST = "_published.json"


def publish_snapshot(
    table: TxTable,
    dest: str,
    version: int | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Export ``table`` at ``version`` (default latest) under ``dest``
    and atomically point the manifest at it. Returns the published
    source version. Idempotent per version: re-publishing the version
    already named by the manifest is a no-op."""
    dest = dest.rstrip("/")
    os.makedirs(dest, exist_ok=True)
    src_version = table.version() if version is None else version
    cur = _read_manifest(dest)
    # idempotence requires BOTH the version and the source table to
    # match: a dest reused for a different table whose version number
    # happens to coincide must re-publish, not keep serving the old
    # table's rows under the new table's name
    if (
        cur
        and cur["source_version"] == src_version
        and cur.get("source_path") == table.path
    ):
        return src_version
    df = table.read(version=src_version)
    snap_dir = f"snapshot-v{src_version}-{uuid.uuid4().hex[:8]}"
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    out_dir = os.path.join(dest, snap_dir)
    writer.parquet(out_dir)
    # count what was just written, not the source again — same number,
    # and parquet count() is footer-metadata-only, so the source
    # snapshot is scanned exactly once per publish
    n_rows = table.spark.read.parquet(out_dir).count()
    tmp = os.path.join(dest, f".tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "snapshot_dir": snap_dir,
                "source_version": src_version,
                "source_path": table.path,
                "n_rows": n_rows,
            },
            fh,
        )
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(dest, MANIFEST))
    return src_version


def _read_manifest(dest: str) -> dict | None:
    try:
        with open(os.path.join(dest, MANIFEST)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def read_published(spark: SparkSession, dest: str) -> DataFrame:
    """Resolve the manifest, read that snapshot — what a foreign Spark
    would do; engines that can't read the manifest just point at
    ``<dest>/<snapshot_dir>`` directly (it is ordinary parquet)."""
    m = _read_manifest(dest.rstrip("/"))
    if m is None:
        raise ValueError(f"nothing published at {dest}")
    return spark.read.parquet(os.path.join(dest.rstrip("/"), m["snapshot_dir"]))


def published_dir(dest: str) -> str:
    """Absolute path of the current snapshot directory (for readers
    that want plain files, not a SparkSession)."""
    m = _read_manifest(dest.rstrip("/"))
    if m is None:
        raise ValueError(f"nothing published at {dest}")
    return os.path.join(dest.rstrip("/"), m["snapshot_dir"])


def prune_published(dest: str, keep: int = 0) -> list[str]:
    """Delete snapshot directories not referenced by the manifest,
    keeping the ``keep`` most recent unreferenced generations as a
    grace window for in-flight readers. Returns the deleted paths."""
    dest = dest.rstrip("/")
    m = _read_manifest(dest)
    live = m["snapshot_dir"] if m else None
    # sort by the embedded source VERSION, not the directory string —
    # lexicographic order puts v10 before v2 and would vacuum the
    # newest grace-window generation instead of the oldest
    def _ver(d: str) -> int:
        return int(d.split("-", 2)[1][1:])

    candidates = sorted(
        (
            d
            for d in os.listdir(dest)
            if d.startswith("snapshot-v") and d != live
            and os.path.isdir(os.path.join(dest, d))
        ),
        key=_ver,
    )
    doomed = candidates[: max(0, len(candidates) - keep)]
    for d in doomed:
        shutil.rmtree(os.path.join(dest, d))
    return [os.path.join(dest, d) for d in doomed]
