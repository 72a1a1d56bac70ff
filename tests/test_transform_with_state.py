"""transformWithState running totals: batch parity and multi-batch
state carry-over. The whole module skips where `protobuf` (the state
server's wire dependency) is not installed — this container lacks it;
the applyInPandasWithState twin is exercised unconditionally in
tests/test_streaming_stateful.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.streaming import (
    _have_protobuf,
    run_transform_with_state_totals,
    transform_with_state_totals,
)

pytestmark = pytest.mark.skipif(
    not _have_protobuf(), reason="google.protobuf not installed in this env"
)


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
