"""OPTIMIZE ZORDER on the transaction-logged table: multi-column
clustering must make min/max data skipping effective on BOTH columns
at once, where row-order (append-order) files prune on neither.

The fixture writes rows whose (x, y) are decorrelated from append
order, so before clustering every file's [min, max] interval spans
nearly the full domain on both columns and a small box predicate
prunes nothing. After ``compact(zorder_by=["x", "y"])`` each file
covers a tight hyper-rectangle and the same box touches only the
files that actually intersect it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable, _with_zvalue

N = 4096
SIDE = 64  # x, y in [0, 64): row i -> (i % 64, (i * 37) % 64)


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "ztx"))
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % SIDE).cast("long").alias("x"),
            ((F.col("id") * 37) % SIDE).cast("long").alias("y"),
        )
        # 8 append-order files: each spans ~the whole x and y domain
        .repartitionByRange(8, "rid")
    )
    t.append(df)
    return t


BOX = [("x", ">=", 0), ("x", "<", 8), ("y", ">=", 0), ("y", "<", 8)]


def test_zorder_improves_multicolumn_skipping(spark, table):
    before = len(table.matching_files(BOX))
    n_before = len(table._replay().files)
    assert before == n_before  # append order: the box prunes nothing

    v = table.compact(target_file_bytes=4 << 10, zorder_by=["x", "y"])
    assert v == 1
    after_files = table.matching_files(BOX)
    n_after = len(table._replay().files)
    assert n_after >= 4  # clustering actually produced multiple files
    # the 1/64-area box must touch well under half the clustered files
    assert len(after_files) <= n_after // 2
    assert len(after_files) < before


def test_zorder_preserves_content_and_time_travel(spark, table):
    rows_before = sorted(
        (r.rid, r.x, r.y) for r in table.read().collect()
    )
    v = table.compact(target_file_bytes=4 << 10, zorder_by=["x", "y"])
    rows_after = sorted(
        (r.rid, r.x, r.y) for r in table.read().collect()
    )
    assert rows_after == rows_before
    # pre-clustering version stays readable (time travel)
    assert table.read(version=v - 1).count() == N


def test_zorder_skipped_reads_are_correct(spark, table):
    table.compact(target_file_bytes=4 << 10, zorder_by=["x", "y"])
    got = sorted(
        (r.rid, r.x, r.y)
        for r in table.read(predicates=BOX).collect()
    )
    want = sorted(
        (i, i % SIDE, (i * 37) % SIDE)
        for i in range(N)
        if i % SIDE < 8 and (i * 37) % SIDE < 8
    )
    assert got == want


def test_zvalue_interleaves_locality(spark):
    """Rows in the same (x, y) quantile cell share a z prefix: the
    max z-spread inside a cell is far below the global spread."""
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    z = _with_zvalue(df, ["x", "y"])
    per_cell = (
        z.groupBy("x", "y")
        .agg((F.max("__z") - F.min("__z")).alias("spread"))
        .agg(F.max("spread").alias("worst"))
        .head()
        .worst
    )
    glob = z.agg((F.max("__z") - F.min("__z")).alias("s")).head().s
    assert per_cell * 16 < glob


def test_zorder_rejects_unknown_columns(spark, table):
    with pytest.raises(ValueError, match="not in table"):
        table.compact(zorder_by=["nope"])
