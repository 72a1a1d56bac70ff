"""Exactly-once streaming into TxTable: batch replays commit nothing,
restart-after-crash resumes from the checkpoint without duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.txsink import (
    stream_to_txtable,
    txtable_batch_writer,
)


@pytest.fixture()
def source_dir(spark, tmp_path):
    import os

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        d = tmp_path / f"stage_{i}"
        spark.createDataFrame(
            [(i * 10 + j, f"f{i}") for j in range(10)], "id long, tag string"
        ).coalesce(1).write.parquet(str(d))
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(str(d / part), str(src / f"file_{i}.parquet"))
    return str(src)


def test_stream_lands_every_row_exactly_once(spark, tmp_path, source_dir):
    table = TxTable(spark, str(tmp_path / "tbl"))
    schema = spark.read.parquet(source_dir).schema
    stream_to_txtable(
        spark, source_dir, schema, table,
        checkpoint_path=str(tmp_path / "ckpt"),
        sink_id="ingest-a", max_files_per_trigger=1,
    )
    assert table.read().count() == 30
    assert table.read().select("id").distinct().count() == 30
    # restart with the same checkpoint: nothing new to do, no dupes
    stream_to_txtable(
        spark, source_dir, schema, table,
        checkpoint_path=str(tmp_path / "ckpt"),
        sink_id="ingest-a", max_files_per_trigger=1,
    )
    assert table.read().count() == 30


def test_replayed_batch_is_a_logged_noop(spark, tmp_path, source_dir):
    """Simulate the crash window: foreachBatch ran, checkpoint commit
    did not — Spark re-invokes the SAME batch_id on restart."""
    table = TxTable(spark, str(tmp_path / "tbl"))
    batch = spark.read.parquet(source_dir).filter(F.col("tag") == "f0")
    writer = txtable_batch_writer(table, "ingest-b")
    writer(batch, 0)
    v = table.version()
    writer(batch, 0)  # the replay
    assert table.version() == v
    assert table.read().count() == 10
    # a genuinely new batch still lands
    writer(spark.read.parquet(source_dir).filter(F.col("tag") == "f1"), 1)
    assert table.read().count() == 20
