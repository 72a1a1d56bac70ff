"""Streaming source over the transaction log's change feed — the
engine-native equivalent of Delta's streaming source: a downstream
Structured Streaming query tails a ``TxTable`` and receives each
append commit's rows exactly once, tagged with ``_commit_version``.

Built on the Spark 4 Python DataSource API
(``SimpleDataSourceStreamReader``, same pattern as
``sources/eegsynth.py``): the offset IS the table version, so

- ``read(start)`` drains every version committed since the last poll
  into one micro-batch and advances the offset to the latest version;
- ``readBetweenOffsets`` (crash-recovery replay of a
  committed-but-unprocessed batch) is trivially exact because
  manifests are immutable — the replayed rows are bit-identical,
  which is what gives the stream exactly-once end-to-end when paired
  with an idempotent sink (streaming/txsink.py or foreachBatch +
  txn_id).

Semantics per commit op mirror ``TxTable.changes``: appends stream
their rows, compaction/zorder are invisible (physical rewrites), and an
overwrite/upsert in the tailed range raises unless
``ignore_rewrites`` is set (the log records file actions, not
row-level deltas).

The reader runs driver-side and decodes parquet with pyarrow directly
(no nested SparkSession); data volume per poll is the new appends,
not the table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from eeg_data_lake_spark.sources.txlog import (
    feed_adds_between,
    iter_manifests,
)

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _ddl_for(path: str) -> str:
    """Union of the live files' schemas + _commit_version, as DDL.

    The union (first-appearance order, like unionByName with
    allowMissingColumns — the rule ``TxTable.changes`` uses) rather
    than any single file: after additive schema evolution, files
    written before the evolution lack the new columns, and which file
    sorts first is an artifact of commit history. Reading every live
    footer is a driver-side O(live files) metadata pass at stream
    start only — bounded by compaction, and the same cost Delta pays
    reading its log checkpoint."""
    import pyarrow.parquet as pq

    if not path:
        # schema() runs before the reader's __init__, so validate here
        # too or a missing option surfaces as FileNotFoundError
        raise ValueError("txlog stream requires .option('path', <table dir>)")
    files = _live_files(path)
    if not files:
        raise ValueError(f"txlog table at {path} has no data to infer from")
    parts: list[str] = []
    seen: dict[str, str] = {}
    for rel in files:
        for f in pq.read_schema(os.path.join(path, rel)):
            t = str(f.type)
            if t.startswith("timestamp"):
                ddl = "timestamp"
            elif t in _ARROW_TO_DDL:
                ddl = _ARROW_TO_DDL[t]
            else:
                raise ValueError(
                    f"txlog stream: unsupported column type {t!r} for {f.name!r}"
                )
            if f.name in seen:
                if seen[f.name] != ddl:
                    raise ValueError(
                        f"txlog stream: column {f.name!r} has conflicting "
                        f"types {seen[f.name]!r} vs {ddl!r} across live files"
                    )
                continue
            seen[f.name] = ddl
            parts.append(f"`{f.name}` {ddl}")
    parts.append("`_commit_version` long")
    return ", ".join(parts)


def _live_files(path: str) -> list[str]:
    files: list[str] = []
    for _v, mp in iter_manifests(path):
        with open(mp) as fh:
            m = json.load(fh)
        live = set(files)
        live -= set(m.get("remove", []))
        live |= set(m.get("add", []))
        files = sorted(live)
    return files


class TxLogStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, fields: list[str]):
        self.path = (options.get("path") or "").rstrip("/")
        if not self.path:
            raise ValueError("txlog stream requires .option('path', <table dir>)")
        self.ignore_rewrites = (
            str(options.get("ignore_rewrites", "false")).lower() == "true"
        )
        start = options.get("startingVersion")
        self._start = int(start) if start is not None else -1
        #: the FULL declared output columns, _commit_version included at
        #: whatever position the resolved schema puts it — rows are
        #: emitted in THIS order regardless of per-file column order,
        #: and the version value is inserted at its declared slot (a
        #: user-supplied .schema() may place it anywhere; appending it
        #: positionally last would silently swap same-typed columns)
        self._fields = fields

    # ------------------------------------------------------------ log

    def _adds_between(self, a: int, b: int) -> list[tuple[int, list[str]]]:
        return feed_adds_between(
            self.path, a, b, self.ignore_rewrites,
            f"txlog stream at {self.path}",
        )

    def _latest(self) -> int:
        v = -1
        for v, _mp in iter_manifests(self.path):
            pass
        return v

    def _rows(self, adds: list[tuple[int, list[str]]]) -> list[tuple]:
        import pyarrow.parquet as pq

        rows: list[tuple] = []
        for v, files in adds:
            for rel in files:
                tbl = pq.read_table(os.path.join(self.path, rel))
                # values keyed by DECLARED field name, never file
                # position — a commit written with reordered columns
                # must not swap values, a column absent from an older
                # file (additive evolution) reads as None, and the
                # commit version fills its own declared slot
                cols = []
                for n in self._fields:
                    if n == "_commit_version":
                        cols.append([v] * tbl.num_rows)
                    elif n in tbl.schema.names:
                        cols.append(tbl.column(n).to_pylist())
                    else:
                        cols.append([None] * tbl.num_rows)
                rows.extend(zip(*cols))
        return rows

    # --------------------------------------------------------- stream

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def read(self, start: dict):
        a = int(start["version"])
        b = self._latest()
        if b <= a:
            # caught up: empty batch, same offset. Must be an ITERATOR —
            # the prefetcher validates no-advance batches with next(it).
            return iter(()), start
        return iter(self._rows(self._adds_between(a, b))), {"version": b}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            self._rows(
                self._adds_between(int(start["version"]), int(end["version"]))
            )
        )


class TxLogStreamDataSource(DataSource):
    """``spark.dataSource.register(TxLogStreamDataSource)`` then
    ``spark.readStream.format("txlogcdc").option("path", tbl).load()``
    to tail a transaction-logged table's appends."""

    @classmethod
    def name(cls) -> str:
        return "txlogcdc"

    def schema(self) -> str:
        return _ddl_for((self.options.get("path") or "").rstrip("/"))

    def simpleStreamReader(self, schema: StructType) -> TxLogStreamReader:
        # pass the resolved schema's field list verbatim: the reader
        # fills _commit_version at its declared position, wherever a
        # user-supplied .schema() put it
        return TxLogStreamReader(
            self.options, [f.name for f in schema.fields]
        )
