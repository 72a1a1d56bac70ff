"""Streaming source over the txlog change feed: appends stream exactly
once with version tags, the stream picks up commits made while it
runs, replay between offsets is bit-exact, and compaction never
re-emits rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.sources.txstream import (
    TxLogStreamDataSource,
    TxLogStreamReader,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.append(_df(spark, 0, 5))
    return t


def test_stream_tails_appends_exactly_once(spark, table, tmp_path):
    spark.dataSource.register(TxLogStreamDataSource)
    import uuid

    name = "txcdc_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("txlogcdc")
        .option("path", table.path)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 5
        # commits made WHILE the stream runs are picked up next poll
        table.append(_df(spark, 5, 8))
        table.append(_df(spark, 8, 10))
        q.processAllAvailable()
        out = spark.table(name)
        assert out.count() == 10
        vers = {
            r["_commit_version"]: r["n"]
            for r in out.groupBy("_commit_version")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert vers == {0: 5, 1: 3, 2: 2}
        assert {r.k for r in out.collect()} == set(range(10))
    finally:
        q.stop()


def test_replay_between_offsets_is_exact(spark, table):
    table.append(_df(spark, 5, 8))
    r = TxLogStreamReader({"path": table.path}, ["k", "v"])
    it1, off1 = r.read(r.initialOffset())
    batch1 = list(it1)
    replay = list(r.readBetweenOffsets(r.initialOffset(), off1))
    assert sorted(batch1) == sorted(replay)
    assert off1 == {"version": 1}
    # caught up → empty batch, unchanged offset
    it2, off2 = r.read(off1)
    assert list(it2) == [] and off2 == off1


def test_compaction_not_reemitted(spark, table):
    r = TxLogStreamReader({"path": table.path}, ["k", "v"])
    _b, off = r.read(r.initialOffset())
    table.compact()
    it, off2 = r.read(off)
    assert list(it) == []
    assert int(off2["version"]) >= int(off["version"])


def test_rewrite_raises_unless_ignored(spark, table):
    r = TxLogStreamReader({"path": table.path}, ["k", "v"])
    _b, off = r.read(r.initialOffset())
    table.upsert(_df(spark, 3, 6), keys=["k"])
    with pytest.raises(ValueError, match="upsert"):
        r.read(off)
    r2 = TxLogStreamReader({"path": table.path, "ignore_rewrites": "true"}, ["k", "v"])
    it, _ = r2.read(off)
    assert list(it) == []


def test_starting_version_skips_history(spark, table):
    table.append(_df(spark, 5, 8))
    r = TxLogStreamReader({"path": table.path, "startingVersion": "0"}, ["k", "v"])
    it, off = r.read(r.initialOffset())
    assert len(list(it)) == 3  # only version 1's rows
    assert off == {"version": 1}


def test_zorder_not_reemitted(spark, table):
    r = TxLogStreamReader({"path": table.path}, ["k", "v"])
    _b, off = r.read(r.initialOffset())
    table.compact(zorder_by=["k"])
    it, off2 = r.read(off)
    assert list(it) == []
    assert int(off2["version"]) >= int(off["version"])


def test_reordered_columns_do_not_swap_values(spark, table):
    """A commit whose parquet was written with a different column
    order must stream values by field NAME, not file position."""
    table.append(
        spark.range(100, 103).select(
            (F.col("id") * 10).alias("v"), F.col("id").alias("k")
        )
    )
    r = TxLogStreamReader(
        {"path": table.path, "startingVersion": "0"},
        ["k", "v", "_commit_version"],
    )
    rows = list(r.read(r.initialOffset())[0])
    assert sorted(rows) == [(100, 1000, 1), (101, 1010, 1), (102, 1020, 1)]


def test_missing_path_option_is_a_clear_error(spark):
    from eeg_data_lake_spark.sources.txstream import _ddl_for

    with pytest.raises(ValueError, match="option"):
        _ddl_for("")


def test_evolved_schema_unions_all_live_files(spark, table):
    """Stream DDL is the union of live-file schemas: a column added by a
    later additively-evolved commit must appear (with NULLs for
    pre-evolution rows), matching TxTable.changes' unionByName rule —
    not just whichever file happens to sort first."""
    evolved = _df(spark, 5, 8).withColumn("extra", F.col("k") + 100)
    table.append(evolved)
    from eeg_data_lake_spark.sources.txstream import _ddl_for

    ddl = _ddl_for(table.path)
    assert "extra" in ddl
    r = TxLogStreamReader({"path": table.path}, ["k", "v", "extra"])
    it, _off = r.read(r.initialOffset())
    rows = list(it)
    by_k = {t[0]: t for t in rows}
    assert by_k[0][2] is None  # pre-evolution row: extra is NULL
    assert by_k[5][2] == 105


def test_user_schema_commit_version_position_respected(
    spark, table, tmp_path
):
    """A user-supplied .schema() may place _commit_version anywhere;
    the version value must fill ITS declared slot, not be appended
    positionally last (which silently swaps same-typed columns)."""
    spark.dataSource.register(TxLogStreamDataSource)
    import uuid

    name = "txcdc_pos_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("txlogcdc")
        .schema("k long, _commit_version long, v long")
        .option("path", table.path)
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pos"))
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r.k: (r._commit_version, r.v)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert rows == {k: (0, k * 10) for k in range(5)}
