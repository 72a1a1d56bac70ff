"""Partitioned writer policy: layout, hot-partition salting fan-out,
and lossless read-back."""

from __future__ import annotations

import glob
import os

from eeg_data_lake_spark.sources.writers import write_partitioned


def _data(spark):
    # one hot partition value ('x' carries 80% of rows)
    rows = [(i, "x" if i % 5 else "y", float(i)) for i in range(500)]
    return spark.createDataFrame(rows, "id long, part string, v double")


def test_partitioned_layout_and_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t1")
    df = _data(spark)
    write_partitioned(df, path, partition_by=["part"])
    assert os.path.isdir(os.path.join(path, "part=x"))
    assert os.path.isdir(os.path.join(path, "part=y"))
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert {r.id for r in back.collect()} == set(range(500))


def test_salting_fans_out_hot_partition(spark, tmp_path):
    one = str(tmp_path / "one")
    fan = str(tmp_path / "fan")
    df = _data(spark)
    write_partitioned(df, one, partition_by=["part"], files_per_partition=1)
    write_partitioned(df, fan, partition_by=["part"], files_per_partition=4)
    n_one = len(glob.glob(os.path.join(one, "part=x", "*.parquet")))
    n_fan = len(glob.glob(os.path.join(fan, "part=x", "*.parquet")))
    assert n_one == 1          # aligned write: one file per partition value
    assert n_fan > 1           # salted write: the hot value fans out
    # still lossless
    assert spark.read.parquet(fan).count() == 500


def test_unpartitioned_write(spark, tmp_path):
    path = str(tmp_path / "t2")
    write_partitioned(_data(spark), path)
    assert spark.read.parquet(path).count() == 500
