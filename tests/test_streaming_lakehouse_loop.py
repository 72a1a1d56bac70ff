"""Capstone composition test: the full streaming lakehouse loop.

raw parquet files ──readStream──▶ bronze TxTable (exactly-once txsink)
bronze TxTable ──format("txlogcdc")──▶ CDC stream ──foreachBatch MERGE──▶ gold TxTable

Both hops are exactly-once (streaming checkpoint × txn-id idempotent
commits), so after draining, gold must equal the one-shot batch
aggregate over the raw input — and re-running either hop must change
nothing. This is the end-to-end contract a Delta medallion deployment
provides, reconstructed from the engine's own pieces."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.sources.txstream import TxLogStreamDataSource
from eeg_data_lake_spark.streaming.incremental import merge_partial_aggregates
from eeg_data_lake_spark.streaming.txsink import stream_to_txtable


@pytest.fixture()
def raw_dir(spark, sf_dir, tmp_path):
    from eeg_data_lake_spark.sources.readers import read_testdata

    e = read_testdata(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = tmp_path / "raw"
    # 3 files → multiple ingest micro-batches with maxFilesPerTrigger=1
    e.repartition(3).write.parquet(str(out))
    return str(out), e.schema


def test_full_loop_equals_batch_aggregate(spark, tmp_path, raw_dir):
    src_dir, schema = raw_dir
    bronze = TxTable(spark, str(tmp_path / "bronze"))
    gold = TxTable(spark, str(tmp_path / "gold"))

    # hop 1: raw files → bronze txlog table, exactly-once
    stream_to_txtable(
        spark, src_dir, schema, bronze,
        checkpoint_path=str(tmp_path / "ck_ingest"),
        sink_id="ingest", max_files_per_trigger=1,
    )
    assert bronze.version() >= 2  # one commit per micro-batch

    # hop 2: bronze CDC stream → gold keyed aggregate, exactly-once
    spark.dataSource.register(TxLogStreamDataSource)

    def fold(batch_df, batch_id):
        partial = (
            batch_df.drop("_commit_version")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
        )
        merge_partial_aggregates(
            gold, partial, ["user_id"], ["n_events", "total_value"],
            txn_id=f"gold:batch-{batch_id}",
        )

    def drain(ck):
        q = (
            spark.readStream.format("txlogcdc")
            .option("path", bronze.path)
            .load()
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(str(tmp_path / "ck_gold"))

    got = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in gold.read().collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.total_value, 4))
        for r in spark.read.parquet(src_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == want

    # idempotence: re-running BOTH hops from their checkpoints is a no-op
    v_bronze, v_gold = bronze.version(), gold.version()
    stream_to_txtable(
        spark, src_dir, schema, bronze,
        checkpoint_path=str(tmp_path / "ck_ingest"),
        sink_id="ingest", max_files_per_trigger=1,
    )
    drain(str(tmp_path / "ck_gold"))
    assert bronze.version() == v_bronze
    assert gold.version() == v_gold

    # late arrival: one more raw file flows through both hops
    spark.createDataFrame(
        [(999999, 10**6, 42.0)], "user_id long, event_id long, value double"
    ).write.mode("append").parquet(src_dir)
    stream_to_txtable(
        spark, src_dir, schema, bronze,
        checkpoint_path=str(tmp_path / "ck_ingest"),
        sink_id="ingest", max_files_per_trigger=1,
    )
    drain(str(tmp_path / "ck_gold"))
    late = {r.user_id: r.n_events for r in gold.read().collect()}
    assert late[999999] == 1
