"""Multi-batch state carry-over for the stateful sessionization
operator: split the events table into 3 time-ordered files, stream
them one file per micro-batch, and require the final per-user session
counts to equal the single-batch (= batch SQL) answer. This is the
test that proves GroupState actually carries across micro-batches —
a single-batch run cannot distinguish stateful from stateless."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.streaming import run_stateful_sessions


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """events split into 3 parquet files by time tercile, mtimes forced
    ascending so the file source (oldest-first) replays them in event-
    time order, as a live append-only source would."""
    from eeg_data_lake_spark.sources.readers import read_testdata

    out = tmp_path_factory.mktemp("events_batches")
    e = read_testdata(spark, sf_dir, "events")
    # NTZ ts: no direct double cast; go through TIMESTAMP (UTC session tz).
    tsec = F.col("ts").cast("timestamp").cast("double")
    bounds = e.selectExpr(
        "percentile(cast(cast(ts as timestamp) as double), 1.0/3) AS t1",
        "percentile(cast(cast(ts as timestamp) as double), 2.0/3) AS t2",
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
                os.rename(
                    os.path.join(d, f), str(out / f"batch_{i}.parquet")
                )
    return str(out)


def test_state_carries_across_micro_batches(spark, sf_dir, split_events_dir):
    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    got = run_stateful_sessions(spark, stream)

    # batch oracle: gap>1h sessionization via window functions
    from eeg_data_lake_spark.sources.readers import read_testdata

    e = read_testdata(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (
                    F.col("ts").cast("timestamp").cast("double")
                    - F.col("prev_ts").cast("timestamp").cast("double")
                    > 3600.0
                )
            ).cast("long"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )
    g = {r.user_id: (r.n_sessions, r.n_events) for r in got.collect()}
    x = {r.user_id: (r.n_sessions, r.n_events) for r in want.collect()}
    assert g == x
    # a user active in every tercile must have been folded over ≥2
    # batches; if state did not carry, its counts could not match
    assert len(g) > 0


def test_multiple_batches_actually_ran(spark, split_events_dir):
    """Belt-and-braces: with maxFilesPerTrigger=1 and 3 files, the
    stream must execute 3 micro-batches, not coalesce into one."""
    schema = spark.read.parquet(split_events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    import uuid

    from eeg_data_lake_spark.workload.streaming import stateful_sessionize

    name = "mb_probe_" + uuid.uuid4().hex[:8]
    q = (
        stateful_sessionize(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()
    assert n_batches >= 3
