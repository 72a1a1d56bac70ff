"""The eegsynth Python DataSource: schema, determinism, one partition
per trial, and planning-time trial_id pushdown actually pruning
partitions (the Python-source analog of parquet partition pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark import schemas
from eeg_data_lake_spark.sources.eegsynth import EEGSynthDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(EEGSynthDataSource)


def _load(spark, **opts):
    r = spark.read.format("eegsynth")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_schema_counts_and_partitioning(spark):
    df = _load(spark, n_trials=4, samples=32)
    assert [f.name for f in df.schema.fields] == [
        "trial_id", "channel", "sample_idx", "time_sec", "value",
    ]
    assert df.count() == 4 * len(schemas.CHANNELS) * 32
    assert df.rdd.getNumPartitions() == 4  # one per trial


def test_deterministic_across_reads(spark):
    a = _load(spark, n_trials=2, samples=16, seed=11)
    b = _load(spark, n_trials=2, samples=16, seed=11)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = _load(spark, n_trials=2, samples=16, seed=12)
    assert a.exceptAll(c).count() > 0  # the seed actually matters


def test_trial_range_pushdown_prunes_partitions(spark):
    df = _load(spark, n_trials=10, samples=8)
    pruned = df.filter((F.col("trial_id") >= 6) & (F.col("trial_id") < 8))
    # planning-time pruning: only trials 6 and 7 ever generate rows,
    # visible as the scan's partition count (not a post-scan filter)
    assert pruned.rdd.getNumPartitions() == 2
    assert {r.trial_id for r in pruned.select("trial_id").distinct().collect()} == {6, 7}
    # unsupported predicates are returned to Spark and still correct
    mixed = df.filter((F.col("trial_id") == 3) & (F.col("channel") == "AF3"))
    assert mixed.rdd.getNumPartitions() == 1
    rows = mixed.collect()
    assert len(rows) == 8 and all(r.channel == "AF3" for r in rows)


def test_signal_shape_matches_fixture_model(spark):
    import numpy as np

    df = _load(spark, n_trials=1, samples=64, seed=7)
    one = (
        df.filter(F.col("channel") == schemas.CHANNELS[0])
        .orderBy("sample_idx")
        .collect()
    )
    t = np.arange(64) / float(schemas.FS)
    rng = np.random.default_rng((7, 0, 0))
    want = np.sin(2.0 * np.pi * 4.0 * t) + 0.1 * rng.standard_normal(64)
    np.testing.assert_allclose([r.value for r in one], want, rtol=1e-12)


def test_stream_reader_drains_all_trials_and_matches_batch(spark):
    import time

    df = (
        spark.readStream.format("eegsynth")
        .option("n_trials", 3)
        .option("samples", 16)
        .option("seed", 5)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("eegsynth_stream")
        .trigger(processingTime="0 seconds")
        .start()
    )
    want_rows = 3 * len(schemas.CHANNELS) * 16
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM eegsynth_stream").head().c >= want_rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    streamed = spark.sql("SELECT * FROM eegsynth_stream")
    assert streamed.count() == want_rows  # one trial per micro-batch, all drained
    batch = _load(spark, n_trials=3, samples=16, seed=5)
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_empty_pushdown_range_yields_zero_rows(spark):
    """A predicate outside the trial range must produce an empty
    result, not crash: partitions() returning [] makes PySpark call
    read(None), so the reader emits an explicit empty sentinel."""
    from pyspark.sql import functions as F

    from eeg_data_lake_spark.sources.eegsynth import EEGSynthDataSource

    spark.dataSource.register(EEGSynthDataSource)
    df = (
        spark.read.format("eegsynth")
        .option("n_trials", "4")
        .load()
        .filter(F.col("trial_id") >= 100)
    )
    assert df.count() == 0
    # contradictory equality conjunction → also empty, not a crash
    df2 = (
        spark.read.format("eegsynth")
        .option("n_trials", "4")
        .load()
        .filter((F.col("trial_id") == 1) & (F.col("trial_id") == 2))
    )
    assert df2.count() == 0


def test_channels_option_strips_whitespace(spark):
    from eeg_data_lake_spark.sources.eegsynth import EEGSynthDataSource

    spark.dataSource.register(EEGSynthDataSource)
    df = (
        spark.read.format("eegsynth")
        .option("n_trials", "1")
        .option("channels", "AF3, AF4")
        .load()
    )
    assert {r.channel for r in df.select("channel").distinct().collect()} == {
        "AF3",
        "AF4",
    }
