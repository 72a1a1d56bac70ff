"""Delta Lake interop — skip-gated on the delta-spark package/jar so
the gated branches in sources/readers.py and sources/writers.py stop
being dead code the day the environment gains the dependency (round-3
verdict task 4). In THIS container the module skips cleanly: the
Delta *semantics* (ACID append/overwrite, time travel, CDC, MERGE,
OPTIMIZE, vacuum) are covered by the from-scratch txlog table
(tests/test_txlog.py and friends); these tests cover format interop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

delta = pytest.importorskip(
    "delta",
    reason=(
        "delta-spark not installed; Delta semantics covered by the txlog "
        "table suite, format interop untestable here"
    ),
)


@pytest.fixture()
def delta_spark(spark):
    """A session whose catalog can resolve the `delta` source; skip if
    the pip package is present but the jar isn't on the classpath
    (readers.py deliberately keys off load() success, not import)."""
    try:
        spark.range(1).write.format("delta").mode("overwrite").save(
            "/tmp/_delta_probe"
        )
    except Exception:
        pytest.skip("delta-spark importable but jar not on session classpath")
    return spark


def test_delta_write_read_roundtrip(delta_spark, tmp_path):
    from eeg_data_lake_spark.sources.readers import read_parquet_table
    from eeg_data_lake_spark.sources.writers import write_partitioned

    df = delta_spark.range(0, 100).select(
        "id", (F.col("id") % 3).alias("bucket"), F.rand(seed=1).alias("v")
    )
    path = str(tmp_path / "dtab")
    write_partitioned(df, path, partition_by=["bucket"], fmt="delta")
    back = read_parquet_table(delta_spark, path)
    assert back.count() == 100
    assert {r.bucket for r in back.select("bucket").distinct().collect()} == {0, 1, 2}


def test_delta_append_then_overwrite(delta_spark, tmp_path):
    from eeg_data_lake_spark.sources.readers import read_parquet_table
    from eeg_data_lake_spark.sources.writers import write_partitioned

    path = str(tmp_path / "dtab2")
    write_partitioned(
        delta_spark.range(0, 10).select("id"), path, mode="append", fmt="delta"
    )
    write_partitioned(
        delta_spark.range(10, 20).select("id"), path, mode="append", fmt="delta"
    )
    assert read_parquet_table(delta_spark, path).count() == 20
    write_partitioned(
        delta_spark.range(0, 5).select("id"), path, mode="overwrite", fmt="delta"
    )
    assert read_parquet_table(delta_spark, path).count() == 5


def test_read_parquet_table_prefers_delta_log(delta_spark, tmp_path):
    """A directory with a _delta_log must resolve through the delta
    source (time travel works), not the raw-parquet fallback."""
    path = str(tmp_path / "dtab3")
    delta_spark.range(0, 4).write.format("delta").save(path)
    delta_spark.range(4, 9).write.format("delta").mode("append").save(path)
    v0 = (
        delta_spark.read.format("delta").option("versionAsOf", 0).load(path)
    )
    assert v0.count() == 4
    from eeg_data_lake_spark.sources.readers import read_parquet_table

    assert read_parquet_table(delta_spark, path).count() == 9
