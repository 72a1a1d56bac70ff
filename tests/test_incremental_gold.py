"""Incremental gold maintenance over the transaction-logged table:
stream the events table in 3 micro-batches, maintain per-(user, day)
count/sum aggregates via foreachBatch MERGE, and require the final
table to equal the one-shot batch aggregate. Then replay a batch
(simulating the crash-between-commit-and-checkpoint window) and
require the table to be unchanged — the exactly-once property."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.incremental import (
    incremental_agg_writer,
    maintain_incremental_gold,
)

KEYS = ["user_id", "day"]
SUMS = ["n_events", "total_value"]


def _partial(batch_df):
    return (
        batch_df.withColumn("day", F.to_date("ts"))
        .groupBy(*KEYS)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    from eeg_data_lake_spark.sources.readers import read_testdata

    out = tmp_path_factory.mktemp("inc_batches")
    e = read_testdata(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    # ts is TIMESTAMP_NTZ in the testdata parquet; NTZ cannot cast
    # straight to double, but NTZ -> TIMESTAMP -> double is allowed.
    tsec = F.col("ts").cast("timestamp").cast("double")
    bounds = e.select(
        F.expr("percentile(cast(cast(ts as timestamp) as double), 1.0/3)").alias("t1"),
        F.expr("percentile(cast(cast(ts as timestamp) as double), 2.0/3)").alias("t2"),
    ).first()
    splits = [
        e.filter(tsec <= bounds.t1),
        e.filter((tsec > bounds.t1) & (tsec <= bounds.t2)),
        e.filter(tsec > bounds.t2),
    ]
    now = time.time()
    for i, part in enumerate(splits):
        d = str(out / f"b{i}")
        part.coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(os.path.join(d, f), (now + i, now + i))
                os.rename(os.path.join(d, f), str(out / f"batch_{i}.parquet"))
    return str(out)


def _snapshot(table):
    return {
        (r.user_id, str(r.day)): (r.n_events, round(r.total_value, 6))
        for r in table.read().collect()
    }


def test_incremental_gold_matches_batch(spark, sf_dir, split_events_dir, tmp_path):
    table = TxTable(spark, str(tmp_path / "gold"))
    schema = spark.read.parquet(split_events_dir).schema
    maintain_incremental_gold(
        spark,
        split_events_dir,
        schema,
        table,
        checkpoint_path=str(tmp_path / "ckpt"),
        sink_id="gold-user-day",
        keys=KEYS,
        partial_agg=_partial,
        sum_cols=SUMS,
        max_files_per_trigger=1,
    )
    # ≥3 upsert commits happened (one per micro-batch)
    assert table.version() >= 2

    from eeg_data_lake_spark.sources.readers import read_testdata

    e = read_testdata(spark, sf_dir, "events")
    want = {
        (r.user_id, str(r.day)): (r.n_events, round(r.total_value, 6))
        for r in _partial(e).collect()
    }
    got = _snapshot(table)
    assert got == want

    # exactly-once: replay batch 0 (same txn_id) — table must not move
    v_before = table.version()
    batch0 = spark.read.parquet(os.path.join(split_events_dir, "batch_0.parquet"))
    writer = incremental_agg_writer(
        table, "gold-user-day", KEYS, _partial, SUMS
    )
    writer(batch0, 0)
    assert table.version() == v_before
    assert _snapshot(table) == want

    # ...while a NEW batch id with the same data is double-counted (the
    # txn-id, not the content, is the dedup key — as in Delta)
    writer(batch0, 99)
    assert table.version() == v_before + 1
    assert _snapshot(table) != want
