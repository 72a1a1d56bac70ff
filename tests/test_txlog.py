"""Transactional semantics of the manifest-committed parquet table:
atomic append, crash-replay idempotence, optimistic concurrency,
MERGE, time travel, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable(spark, str(tmp_path / "tx"))


def test_append_and_time_travel(spark, table):
    assert table.append(_df(spark, [(1, "a")])) == 0
    assert table.append(_df(spark, [(2, "b")])) == 1
    assert {r.id for r in table.read().collect()} == {1, 2}
    assert {r.id for r in table.read(version=0).collect()} == {1}
    with pytest.raises(ValueError, match="does not exist"):
        table.read(version=9)


def test_txn_id_makes_retries_idempotent(spark, table):
    df = _df(spark, [(1, "a"), (2, "b")])
    v1 = table.append(df, txn_id="ingest-batch-7")
    v2 = table.append(df, txn_id="ingest-batch-7")  # job retry
    assert v1 == v2 == 0
    assert table.read().count() == 2  # not 4


def test_crashed_commit_is_invisible_and_replay_safe(spark, table):
    table.append(_df(spark, [(1, "a")]), txn_id="b0")
    # simulate a crash AFTER data files land but BEFORE the manifest
    # link: write data with no commit
    table._write_data(_df(spark, [(99, "zz")]))
    assert table.read().count() == 1  # orphan files invisible
    assert table.version() == 0
    # the retried job re-runs the same logical commit and succeeds once
    table.append(_df(spark, [(99, "zz")]), txn_id="b1")
    table.append(_df(spark, [(99, "zz")]), txn_id="b1")
    assert {r.id for r in table.read().collect()} == {1, 99}
    # vacuum removes the orphan (and nothing live)
    deleted = table.vacuum(keep_versions=10)
    assert deleted  # the crashed commit's files
    assert {r.id for r in table.read().collect()} == {1, 99}


def test_concurrent_commit_collision_retries(spark, table):
    table.append(_df(spark, [(1, "a")]))
    # another writer steals version 1 between our replay and link:
    # pre-create the manifest it would have written
    with open(os.path.join(table.log_dir, "00000001.json"), "w") as fh:
        json.dump({"op": "append", "add": [], "remove": [], "txn_id": None}, fh)
    v = table.append(_df(spark, [(2, "b")]))
    assert v == 2  # lost the race at 1, landed at 2
    assert {r.id for r in table.read().collect()} == {1, 2}


def test_upsert_merge_and_history(spark, table):
    table.append(_df(spark, [(1, "a"), (2, "b")]))
    table.upsert(_df(spark, [(2, "B2"), (3, "c")]), keys=["id"])
    got = {r.id: r.v for r in table.read().collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}
    # pre-merge version still intact (time travel across a rewrite)
    old = {r.id: r.v for r in table.read(version=0).collect()}
    assert old == {1: "a", 2: "b"}
    # vacuum(0) drops the rewritten files → old version unreadable,
    # latest unaffected
    table.vacuum(keep_versions=0)
    assert {r.id: r.v for r in table.read().collect()} == got


def test_read_is_spark_native_and_prunable(spark, table):
    """The read path is a plain parquet scan — filters/pruning reach
    the files as usual (the point of logging paths, not rows)."""
    table.append(_df(spark, [(i, f"v{i}") for i in range(100)]))
    plan = (
        table.read()
        .filter(F.col("id") == 7)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,7)]" in plan
