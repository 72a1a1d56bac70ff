"""Streaming bronze ingest: exactly-once semantics of the
checkpointed file source (the engine-level replacement for the
reference's boto3 exists-check idempotence, S15)."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark import fixtures
from eeg_data_lake_spark.pipeline import bronze_from_lines
from eeg_data_lake_spark.streaming import stream_bronze_from_lines


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "raw"),
        "sink": str(tmp_path / "bronze"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_stream_matches_batch_and_is_idempotent(spark, dirs):
    fixtures.write_mindbigdata_csvs(dirs["src"], n_files=3)
    stream_bronze_from_lines(spark, dirs["src"], dirs["sink"], dirs["ckpt"])
    streamed = spark.read.parquet(dirs["sink"])
    batch = bronze_from_lines(spark, dirs["src"])
    assert streamed.count() == batch.count()
    assert set(streamed.columns) == set(batch.columns)

    # re-run with no new files: checkpoint prevents re-ingest
    stream_bronze_from_lines(spark, dirs["src"], dirs["sink"], dirs["ckpt"])
    assert spark.read.parquet(dirs["sink"]).count() == batch.count()


def test_incremental_pickup_of_new_files(spark, dirs):
    fixtures.write_mindbigdata_csvs(dirs["src"], n_files=2)
    stream_bronze_from_lines(spark, dirs["src"], dirs["sink"], dirs["ckpt"])
    n1 = spark.read.parquet(dirs["sink"]).count()

    fixtures.write_mindbigdata_csvs(dirs["src"], n_files=4)  # adds files 2,3
    stream_bronze_from_lines(spark, dirs["src"], dirs["sink"], dirs["ckpt"])
    n2 = spark.read.parquet(dirs["sink"]).count()
    assert n2 > n1
    assert n2 == bronze_from_lines(spark, dirs["src"]).count()


def test_streaming_silver_foreach_batch_matches_batch(spark, dirs, tmp_path):
    """bronze stream → foreachBatch silver == batch silver, and a
    re-run ingests nothing new (checkpointed)."""
    from eeg_data_lake_spark.pipeline import silver_from_bronze
    from eeg_data_lake_spark.streaming import stream_silver_from_bronze_dir

    fixtures.write_mindbigdata_csvs(dirs["src"], n_files=2)
    stream_bronze_from_lines(spark, dirs["src"], dirs["sink"], dirs["ckpt"])

    silver_sink = str(tmp_path / "silver")
    silver_ckpt = str(tmp_path / "silver_ckpt")
    stream_silver_from_bronze_dir(spark, dirs["sink"], silver_sink, silver_ckpt)
    # per-batch subdirectories → recursive read (see streaming.silver docs)
    streamed = spark.read.option("recursiveFileLookup", "true").parquet(silver_sink)
    batch = silver_from_bronze(spark.read.parquet(dirs["sink"]))
    assert streamed.count() == batch.count()
    assert set(streamed.columns) == set(batch.columns)
    # z-scores identical row-for-row (keyed by trial/channel/sample)
    key = ["trial_id", "channel", "sample_idx"]
    s = {tuple(r[k] for k in key): round(r.z, 9) for r in streamed.collect()}
    b = {tuple(r[k] for k in key): round(r.z, 9) for r in batch.collect()}
    assert s == b

    # idempotent re-run
    stream_silver_from_bronze_dir(spark, dirs["sink"], silver_sink, silver_ckpt)
    assert (
        spark.read.option("recursiveFileLookup", "true").parquet(silver_sink).count()
        == batch.count()
    )
