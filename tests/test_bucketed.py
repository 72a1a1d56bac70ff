"""Bucketed co-located joins: the write-once shuffle pays off as a
zero-exchange join plan, and upserts preserve table contents."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.plans import count_exchanges, join_strategies
from eeg_data_lake_spark.sources.bucketed import bucketed_join, write_bucketed
from eeg_data_lake_spark.sources.merge import merge_upsert


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from eeg_data_lake_spark.workload.registry import t

    write_bucketed(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_bkt", ["o_custkey"], 4,
    )
    write_bucketed(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        "customer_bkt", ["o_custkey"], 4,
    )
    yield "orders_bkt", "customer_bkt"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["o_custkey"])
    assert count_exchanges(joined) == 0          # co-located: no shuffle
    assert "SortMergeJoin" in join_strategies(joined)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    from eeg_data_lake_spark.workload.registry import t

    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, ["o_custkey"]).count()
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    expected = o.join(c, o.o_custkey == c.c_custkey).count()
    assert got == expected


def test_merge_upsert_semantics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, tag string, v double"
    )
    merge_upsert(spark, path, base, keys=["id"])
    updates = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], "id long, tag string, v double"
    )
    merge_upsert(spark, path, updates, keys=["id"])
    rows = {r.id: (r.tag, r.v) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_merge_upsert_partitioned_touches_only_hit_partitions(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "p1", 1.0), (2, "p1", 2.0), (3, "p2", 3.0)],
        "id long, part string, v double",
    )
    merge_upsert(spark, path, base, keys=["id"], partition_by=["part"])
    updates = spark.createDataFrame([(2, "p1", 20.0)], "id long, part string, v double")
    merge_upsert(spark, path, updates, keys=["id"], partition_by=["part"])
    rows = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert rows == {1: 1.0, 2: 20.0, 3: 3.0}


def test_merge_upsert_rejects_partition_moving_updates(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200)], "id long, part string, v long"
    )
    merge_upsert(spark, path, base, keys=["id"], partition_by=["part"])
    # same key appearing under two partition values inside the updates:
    # functionally-dependent contract violated → must raise
    moving = spark.createDataFrame(
        [(1, "a", 101), (1, "b", 102)], "id long, part string, v long"
    )
    with pytest.raises(ValueError, match="functionally dependent"):
        merge_upsert(spark, path, moving, keys=["id"], partition_by=["part"])
    # partition column inside the keys is always fine
    ok = spark.createDataFrame(
        [(1, "a", 103)], "id long, part string, v long"
    )
    merge_upsert(spark, path, ok, keys=["id", "part"], partition_by=["part"])
    got = {r.id: r.v for r in spark.read.parquet(path).filter(F.col("part") == "a").collect()}
    assert got[1] == 103
