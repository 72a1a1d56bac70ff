"""Join-strategy hints: the explicit control surface over Catalyst's
join selection (the knob you reach for on a cluster when statistics
mislead the optimizer — e.g. a filtered dimension whose estimated size
still blocks a broadcast, or a skewed build side that must not hash).

Also pins Spark 4 parameterized SQL (spark.sql(..., args=...)) — the
injection-safe way to template the workload queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from eeg_data_lake_spark.plans.inspect import join_strategies
from eeg_data_lake_spark.sources.readers import read_testdata


def _sides(spark, sf_dir):
    orders = read_testdata(spark, sf_dir, "orders")
    cust = read_testdata(spark, sf_dir, "customer")
    return orders, cust


def test_broadcast_hint_forces_broadcast(spark, sf_dir):
    orders, cust = _sides(spark, sf_dir)
    df = orders.join(cust.hint("broadcast"), orders.o_custkey == cust.c_custkey)
    assert set(join_strategies(df)) == {"BroadcastHashJoin"}


def test_merge_hint_forces_sort_merge(spark, sf_dir):
    orders, cust = _sides(spark, sf_dir)
    df = orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    assert set(join_strategies(df)) == {"SortMergeJoin"}


def test_shuffle_hash_hint_forces_hash(spark, sf_dir):
    orders, cust = _sides(spark, sf_dir)
    df = orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
    assert set(join_strategies(df)) == {"ShuffledHashJoin"}


def test_hinted_joins_agree_on_results(spark, sf_dir):
    """The hint changes the physical strategy, never the answer."""
    orders, cust = _sides(spark, sf_dir)
    out = []
    for h in ("broadcast", "merge", "shuffle_hash"):
        df = (
            orders.join(cust.hint(h), orders.o_custkey == cust.c_custkey)
            .agg(
                F.count("*").alias("n"),
                F.sum("o_totalprice").cast("decimal(20,2)").alias("s"),
            )
        )
        out.append(df.collect()[0])
    assert out[0] == out[1] == out[2]


def test_parameterized_sql(spark, sf_dir):
    read_testdata(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    df = spark.sql(
        "SELECT count(*) AS n FROM orders_v WHERE o_orderpriority = :prio",
        args={"prio": "1-URGENT"},
    )
    direct = (
        read_testdata(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .count()
    )
    assert df.collect()[0].n == direct
