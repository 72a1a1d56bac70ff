"""Streaming facts enriched against an SCD2 dimension at EVENT time:
late facts get the old dimension version, fresh facts the new one,
unknown keys survive with NULLs, and the sink is exactly-once."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.scd import scd2_apply
from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.enrich import (
    enrich_as_of,
    scd2_enrich_writer,
    stream_enrich_to_txtable,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 10)


@pytest.fixture()
def dim_table(spark, tmp_path):
    table = TxTable(spark, str(tmp_path / "dim"))
    v0 = spark.createDataFrame(
        [(1, "bronze"), (2, "silver")], "user_id long, tier string"
    )
    scd2_apply(table, v0, keys=["user_id"], change_ts=F.lit(T0), txn_id="d0")
    v1 = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    scd2_apply(table, v1, keys=["user_id"], change_ts=F.lit(T1), txn_id="d1")
    return table


@pytest.fixture()
def fact_dir(spark, tmp_path):
    src = tmp_path / "facts"
    src.mkdir()
    batches = [
        # batch 0: one fact before the tier change, one unknown user
        [(100, 1, dt.datetime(2024, 1, 5)), (101, 3, dt.datetime(2024, 1, 6))],
        # batch 1: facts after the change + a LATE fact from before it
        [(102, 1, dt.datetime(2024, 1, 15)), (103, 1, dt.datetime(2024, 1, 7))],
    ]
    for i, rows in enumerate(batches):
        d = tmp_path / f"stage_{i}"
        spark.createDataFrame(
            rows, "fact_id long, user_id long, ts timestamp"
        ).coalesce(1).write.parquet(str(d))
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(str(d / part), str(src / f"file_{i}.parquet"))
    return str(src)


def test_event_time_enrichment_versions(spark, tmp_path, dim_table, fact_dir):
    out = TxTable(spark, str(tmp_path / "out"))
    schema = spark.read.parquet(fact_dir).schema
    stream_enrich_to_txtable(
        spark, fact_dir, schema, dim_table, out,
        keys=["user_id"], ts_col="ts",
        checkpoint_path=str(tmp_path / "ckpt"), sink_id="enrich-a",
        max_files_per_trigger=1,
    )
    got = {r["fact_id"]: r["tier"] for r in out.read().collect()}
    assert got == {
        100: "bronze",  # before the change → old version
        101: None,      # unknown user → NULL attribute, fact kept
        102: "gold",    # after the change → new version
        103: "bronze",  # LATE fact → version valid at EVENT time
    }
    # restart on the same checkpoint: no duplicates
    stream_enrich_to_txtable(
        spark, fact_dir, schema, dim_table, out,
        keys=["user_id"], ts_col="ts",
        checkpoint_path=str(tmp_path / "ckpt"), sink_id="enrich-a",
        max_files_per_trigger=1,
    )
    assert out.read().count() == 4


def test_batch_replay_is_noop(spark, tmp_path, dim_table):
    out = TxTable(spark, str(tmp_path / "out"))
    batch = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 5))], "fact_id long, user_id long, ts timestamp"
    )
    w = scd2_enrich_writer(dim_table, out, ["user_id"], "ts", "enrich-b")
    w(batch, 7)
    w(batch, 7)  # foreachBatch at-least-once replay
    assert out.read().count() == 1


def test_enrich_picks_up_dim_commits_between_batches(spark, tmp_path, dim_table):
    """A dimension change committed mid-stream applies to later batches
    (fresh snapshot per batch), still versioned by event time."""
    out = TxTable(spark, str(tmp_path / "out"))
    w = scd2_enrich_writer(dim_table, out, ["user_id"], "ts", "enrich-c")
    w(
        spark.createDataFrame(
            [(1, 2, dt.datetime(2024, 1, 20))],
            "fact_id long, user_id long, ts timestamp",
        ),
        0,
    )
    v2 = spark.createDataFrame(
        [(1, "gold"), (2, "platinum")], "user_id long, tier string"
    )
    scd2_apply(
        dim_table, v2, keys=["user_id"],
        change_ts=F.lit(dt.datetime(2024, 1, 25)), txn_id="d2",
    )
    w(
        spark.createDataFrame(
            [(2, 2, dt.datetime(2024, 1, 26)), (3, 2, dt.datetime(2024, 1, 21))],
            "fact_id long, user_id long, ts timestamp",
        ),
        1,
    )
    got = {r["fact_id"]: r["tier"] for r in out.read().collect()}
    # fact 3 is after the batch-0 commit but BEFORE the change ts —
    # event-time versioning still hands it silver
    assert got == {1: "silver", 2: "platinum", 3: "silver"}


def test_enrich_plan_is_broadcast(spark, dim_table):
    from eeg_data_lake_spark.plans import has_cartesian_or_bnlj, join_strategies

    facts = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 5))], "fact_id long, user_id long, ts timestamp"
    )
    df = enrich_as_of(facts, dim_table.read(), ["user_id"], "ts")
    assert "BroadcastHashJoin" in join_strategies(df)
    assert not has_cartesian_or_bnlj(df)
