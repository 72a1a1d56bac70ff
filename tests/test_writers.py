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


def test_partition_pruning_on_readback(spark, tmp_path):
    """A filter on the partition column must land in the scan's
    PartitionFilters (directory-level pruning — the mechanism that
    turns a 100 TB table scan into a single-partition read), and the
    data filter must NOT degrade into a post-scan Filter on the
    partition column."""
    path = str(tmp_path / "pp")
    write_partitioned(_data(spark), path, partition_by=["part"])
    df = spark.read.parquet(path).filter("part = 'y'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate appears inside PartitionFilters ...
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "part" in m.group(1)
    # ... and the scan actually reads only the matching directory:
    # executing through the scan's metrics, exactly one of the two
    # partition directories survives pruning (inputFiles() can't show
    # this — it lists the relation's files BEFORE pruning)
    assert len(df.collect()) == 100  # collect() runs THIS plan, so its
    # scan metrics populate (count() would execute a separate agg plan)
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().head()
    n_parts = scan.metrics().apply("numPartitions").value()
    assert n_parts == 1, f"expected 1 pruned partition, scanned {n_parts}"


def test_batch_reader_restores_nanos_conf(spark, sf_dir):
    """The legacy nanosAsLong conf is scoped to the read: leaked
    session-wide it silently changes the dtype of every later parquet
    read with TIMESTAMP(NANOS) columns. The returned frame must still
    execute correctly AFTER the restore."""
    from eeg_data_lake_spark.sources.readers import read_testdata

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    df = read_testdata(spark, sf_dir, "events")
    assert spark.conf.get(key, None) == before  # restored
    assert df.count() > 0  # execution works post-restore
    assert dict(df.dtypes)["ts"] == "timestamp"
