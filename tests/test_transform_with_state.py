"""transformWithState running totals: batch parity and multi-batch
state carry-over. The two transformWithState tests gate on a FEATURE
PROBE (`_have_protobuf` — the API speaks a protobuf state-server
protocol and the pure-Python dep is absent in this container); the
SAME running-totals semantics are asserted equal unconditionally via
the protobuf-free applyInPandasWithState twin below, so the custom
per-key-state capability is proven here either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.streaming import (
    _have_protobuf,
    apws_running_totals,
    run_transform_with_state_totals,
    transform_with_state_totals,
)

needs_tws = pytest.mark.skipif(
    not _have_protobuf(),
    reason=(
        "google.protobuf (transformWithStateInPandas state-server wire "
        "dependency) not installed; capability asserted equal via the "
        "applyInPandasWithState twin (apws_running_totals) in this module "
        "and by q39"
    ),
)


@needs_tws
def test_single_batch_equals_batch_aggregate(spark, sf_dir):
    from eeg_data_lake_spark.sources.readers import (
        read_testdata,
        read_testdata_stream,
    )

    got = run_transform_with_state_totals(
        spark, read_testdata_stream(spark, sf_dir, "events")
    )
    want = (
        read_testdata(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert g[k][1] == pytest.approx(w[k][1], abs=1e-3)


@needs_tws
def test_state_carries_across_micro_batches(spark, sf_dir, tmp_path):
    """3 single-file micro-batches; ValueState must accumulate across
    them — final totals equal the one-shot aggregate."""
    from eeg_data_lake_spark.sources.readers import read_testdata

    e = read_testdata(spark, sf_dir, "events").select("user_id", "value", "event_id")
    parts = e.randomSplit([1.0, 1.0, 1.0], seed=11)
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "b*"))
    )
    import uuid

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    name = "tws_mb_" + uuid.uuid4().hex[:8]
    q = (
        transform_with_state_totals(stream)
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
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    want = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert g[k][1] == pytest.approx(w[k][1], abs=1e-3)


def test_apws_twin_equals_batch_aggregate_multibatch(spark, sf_dir, tmp_path):
    """The protobuf-free alternative path, asserted equal: the
    applyInPandasWithState running-totals twin over 3 single-file
    micro-batches must land on the one-shot batch aggregate — the
    exact invariant the gated transformWithState tests pin. Runs in
    every environment."""
    import uuid

    from eeg_data_lake_spark.sources.readers import read_testdata

    e = read_testdata(spark, sf_dir, "events").select("user_id", "value", "event_id")
    parts = e.randomSplit([1.0, 1.0, 1.0], seed=11)
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "b*"))
    )
    name = "apws_tw_" + uuid.uuid4().hex[:8]
    q = (
        apws_running_totals(stream)
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
    assert n_batches >= 3  # state really carried across micro-batches
    got = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    want = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0]
        assert g[k][1] == pytest.approx(w[k][1], abs=1e-3)
