"""A minimal transaction-logged parquet table (Delta-pattern, no jar).

The reference stores every layer in Delta Lake (e.g.
/root/reference/main/silver.py:80, /root/reference/delta_bronze.py:81)
and leans on its transaction log for atomic append, MERGE and time
travel. delta-spark is not on this container's classpath, so this
module implements the same *pattern* over plain parquet — the three
properties a lakehouse table actually needs, with the same
commit-protocol shape Delta uses:

- **Atomic commit.** Data files are written to a per-commit directory
  under ``data/``; the commit point is the creation of
  ``_txlog/<version>.json`` via ``os.link`` (create-exclusive). A
  crash before the link leaves orphan data files that no reader ever
  sees; a crash after is a completed commit. There is no in-between.
- **Optimistic concurrency.** Two writers racing to version N: the
  second ``os.link`` raises FileExistsError and the loser re-reads the
  log and retries at N+1 (Delta's protocol on HDFS/ABFS; on S3 Delta
  needs a coordination service for the same step, and so would this).
- **Idempotent re-runs.** Each commit records an optional
  ``txn_id``; committing an already-logged txn_id is a no-op, so a
  retried ingest job cannot double-append (Delta's ``txn`` action;
  replaces the reference's boto3 exists-check at
  /root/reference/bronze-to-silver.py:49-54 with an engine-level
  guarantee).

Reads pin a version: ``read(version=N)`` reconstructs the file list
at N (time travel); default is the latest. Old files are retained
until ``vacuum(keep_versions=...)``.

Scale notes: the log is O(commits) tiny JSON files and each commit is
O(files touched) — never proportional to table size. Readers list one
directory and read one JSON per version replay; at real scale you'd
checkpoint the log periodically exactly as Delta does (not needed at
test scale, noted for parity).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class _LogState:
    version: int  # latest committed version, -1 if none
    files: list[str]  # live data files (relative paths) at `version`
    txn_ids: set[str]  # every txn_id ever committed


class TxTable:
    """Handle to a transaction-logged parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.log_dir = os.path.join(self.path, "_txlog")
        self.data_dir = os.path.join(self.path, "data")
        os.makedirs(self.log_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # ------------------------------------------------------------- log

    def _replay(self, upto: int | None = None) -> _LogState:
        """Fold the manifest actions into (live files, seen txns)."""
        files: list[str] = []
        txns: set[str] = set()
        version = -1
        for v, manifest_path in self._manifests():
            if upto is not None and v > upto:
                break
            with open(manifest_path) as fh:
                m = json.load(fh)
            live = set(files)
            live -= set(m.get("remove", []))
            live |= set(m.get("add", []))
            files = sorted(live)
            if m.get("txn_id"):
                txns.add(m["txn_id"])
            version = v
        if upto is not None and version < upto:
            raise ValueError(
                f"version {upto} does not exist (latest is {version})"
            )
        return _LogState(version, files, txns)

    def _manifests(self):
        names = sorted(
            n for n in os.listdir(self.log_dir) if n.endswith(".json")
        )
        for n in names:
            yield int(n[:-5]), os.path.join(self.log_dir, n)

    def version(self) -> int:
        return self._replay().version

    # ---------------------------------------------------------- commit

    def _write_data(self, df: DataFrame) -> list[str]:
        commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
        df.write.parquet(os.path.join(self.data_dir, commit_dir))
        out = []
        for root, _dirs, names in os.walk(os.path.join(self.data_dir, commit_dir)):
            for n in names:
                if n.endswith(".parquet"):
                    out.append(
                        os.path.relpath(os.path.join(root, n), self.path)
                    )
        return sorted(out)

    def _commit(
        self,
        add: list[str],
        remove: list[str],
        txn_id: str | None,
        op: str,
    ) -> int:
        """Create-exclusive the next manifest; retry on collision."""
        while True:
            state = self._replay()
            if txn_id and txn_id in state.txn_ids:
                # idempotent replay: the work is already committed;
                # newly-written data files are orphans no reader sees
                return state.version
            target = os.path.join(
                self.log_dir, f"{state.version + 1:08d}.json"
            )
            tmp = os.path.join(
                self.log_dir, f".tmp-{uuid.uuid4().hex[:12]}"
            )
            with open(tmp, "w") as fh:
                json.dump(
                    {"op": op, "add": add, "remove": remove, "txn_id": txn_id},
                    fh,
                )
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, target)  # atomic create-exclusive
                return state.version + 1
            except FileExistsError:
                continue  # lost the race — re-read the log, try again
            finally:
                os.unlink(tmp)

    # ------------------------------------------------------------- ops

    def append(self, df: DataFrame, txn_id: str | None = None) -> int:
        """Atomically append ``df``; replaying the same txn_id is a
        no-op. Returns the committed (or already-current) version."""
        return self._commit(self._write_data(df), [], txn_id, "append")

    def overwrite(self, df: DataFrame, txn_id: str | None = None) -> int:
        state = self._replay()
        return self._commit(
            self._write_data(df), state.files, txn_id, "overwrite"
        )

    def upsert(
        self,
        updates: DataFrame,
        keys: list[str],
        txn_id: str | None = None,
    ) -> int:
        """MERGE: matched keys replaced, new keys appended — implemented
        as survivors ⋃ updates into fresh files, old files logged as
        removed (still readable via time travel)."""
        state = self._replay()
        if state.version < 0:
            return self.append(updates, txn_id)
        survivors = self.read().join(updates, keys, "left_anti")
        merged = survivors.unionByName(updates)
        return self._commit(
            self._write_data(merged), state.files, txn_id, "upsert"
        )

    def read(self, version: int | None = None) -> DataFrame:
        """The table at ``version`` (default: latest). Empty table →
        raises (no schema to serve), matching Delta."""
        state = self._replay(upto=version)
        if not state.files:
            raise ValueError(f"table at {self.path} has no data")
        paths = [os.path.join(self.path, f) for f in state.files]
        return self.spark.read.parquet(*paths)

    def vacuum(self, keep_versions: int = 0) -> list[str]:
        """Delete data files unreachable from the newest
        ``keep_versions + 1`` versions (and orphans from crashed
        commits). Returns deleted paths."""
        latest = self.version()
        keep: set[str] = set()
        for v in range(max(0, latest - keep_versions), latest + 1):
            keep |= set(self._replay(upto=v).files)
        deleted = []
        for root, _dirs, names in os.walk(self.data_dir):
            for n in names:
                full = os.path.join(root, n)
                rel = os.path.relpath(full, self.path)
                if n.endswith(".parquet") and rel not in keep:
                    os.unlink(full)
                    deleted.append(rel)
        # drop now-empty commit dirs
        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            if os.path.isdir(full) and not any(
                f.endswith(".parquet")
                for _r, _d, fs in os.walk(full)
                for f in fs
            ):
                shutil.rmtree(full)
        return sorted(deleted)
