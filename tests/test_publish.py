"""Publish/export: foreign-readable snapshots with manifest-last swap,
idempotence, partitioned layout, and prune semantics."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.publish import (
    prune_published,
    publish_snapshot,
    published_dir,
    read_published,
)
from eeg_data_lake_spark.sources.txlog import TxTable


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
            "id long, v string, day string",
        )
    )
    return t


def test_roundtrip_and_foreign_reader(spark, table, tmp_path):
    dest = str(tmp_path / "pub")
    v = publish_snapshot(table, dest)
    assert v == table.version()
    got = sorted(map(tuple, read_published(spark, dest).select("id", "v", "day").collect()))
    want = sorted(map(tuple, table.read().select("id", "v", "day").collect()))
    assert got == want
    # a reader with no engine at all: DuckDB over the plain directory
    d = published_dir(dest)
    n = duckdb.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchall()[0][0]
    assert n == 3


def test_republish_swaps_and_is_idempotent(spark, table, tmp_path):
    dest = str(tmp_path / "pub")
    publish_snapshot(table, dest)
    d1 = published_dir(dest)
    # same version again: no new snapshot dir
    publish_snapshot(table, dest)
    assert published_dir(dest) == d1
    table.append(
        spark.createDataFrame([(4, "d", "d2")], "id long, v string, day string")
    )
    publish_snapshot(table, dest)
    d2 = published_dir(dest)
    assert d2 != d1 and os.path.isdir(d1)  # old gen intact until prune
    assert read_published(spark, dest).count() == 4
    deleted = prune_published(dest)
    assert d1 in deleted and not os.path.isdir(d1)
    assert os.path.isdir(d2)


def test_partitioned_publish_and_version_pin(spark, table, tmp_path):
    v0 = table.version()
    table.append(
        spark.createDataFrame([(9, "z", "d9")], "id long, v string, day string")
    )
    dest = str(tmp_path / "pub")
    publish_snapshot(table, dest, version=v0, partition_by=["day"])
    out = read_published(spark, dest)
    assert out.count() == 3  # the pinned old version, not latest
    assert sorted(os.listdir(published_dir(dest)))[0].startswith("day=") or any(
        e.startswith("day=") for e in os.listdir(published_dir(dest))
    )
    # partition pruning works on the published layout
    pruned = out.filter(F.col("day") == "d1")
    assert pruned.count() == 2


def test_prune_keep_respects_version_order(spark, table, tmp_path):
    """keep=1 must retain the NEWEST unreferenced generation even when
    the version count crosses a digit boundary (v10 sorts before v2
    lexicographically — the trap)."""
    from eeg_data_lake_spark.sources.publish import _read_manifest

    dest = str(tmp_path / "pub")
    dirs = []
    for i in range(11):  # publish versions v0..v10 → ten stale gens
        publish_snapshot(table, dest)
        dirs.append(published_dir(dest))
        table.append(
            spark.createDataFrame(
                [(100 + i, "x", "d1")], "id long, v string, day string"
            )
        )
    publish_snapshot(table, dest)
    live = published_dir(dest)
    deleted = prune_published(dest, keep=1)
    assert live not in deleted
    # the newest stale generation (the one for v10) survives; v0..v9 die
    assert dirs[-1] not in deleted
    assert all(d in deleted for d in dirs[:-1])


def test_publish_different_table_same_version_not_skipped(
    spark, table, tmp_path
):
    """Idempotence keys on (source_path, version), not version alone: a
    dest reused for a DIFFERENT table whose version coincides must
    re-publish, not keep serving the old table's rows."""
    dest = str(tmp_path / "pub")
    publish_snapshot(table, dest)
    other = TxTable(spark, str(tmp_path / "other"))
    other.append(
        spark.createDataFrame([(99, "zz", "d9")], "id long, v string, day string")
    )
    assert other.version() == table.version()  # same version number
    publish_snapshot(other, dest)
    got = {r.id for r in read_published(spark, dest).collect()}
    assert got == {99}
