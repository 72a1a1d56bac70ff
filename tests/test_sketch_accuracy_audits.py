"""Accuracy audits for the approximate aggregates used in the gold
layer (the r15-style pre-100 TB adequacy check, applied to quantile and
distinct sketches):

- percentile_approx (GK sketch) vs the exact rank-based operator at
  several accuracy settings — the error must respect the sketch's
  rank-error contract, and accuracy=very-high must converge to exact;
- approx_count_distinct (HLL++) vs exact — relative error within the
  configured rsd bound (with slack: rsd is a standard deviation, not a
  hard cap);
- mapInArrow surface: the one Arrow batch API not yet pinned by
  tests/test_pandas_udf_surface.py."""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.percentiles import exact_percentiles
from eeg_data_lake_spark.workload.registry import t


def test_percentile_approx_rank_error_contract(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    exact = {
        r["l_returnflag"]: r["p95"]
        for r in exact_percentiles(
            li, "l_returnflag", "l_extendedprice", [0.95]
        ).collect()
    }
    n_by_key = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    for accuracy in (100, 10_000):
        approx = {
            r["l_returnflag"]: r["apx"]
            for r in li.groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", 0.95, accuracy).alias("apx"))
            .collect()
        }
        for k, ex in exact.items():
            # GK contract: the returned value's RANK is within n/accuracy
            # of the target rank. Convert to a value-space check via the
            # observed quantile spread: just assert the approx value's
            # true rank is close enough.
            n = n_by_key[k]
            rank_of_apx = li.filter(
                (F.col("l_returnflag") == k)
                & (F.col("l_extendedprice") <= approx[k])
            ).count()
            target = 0.95 * n
            assert abs(rank_of_apx - target) <= n / accuracy + 1, (
                k, accuracy, rank_of_apx, target
            )
    # very high accuracy converges to the exact interpolated neighborhood
    tight = {
        r["l_returnflag"]: r["apx"]
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", 0.95, 100_000).alias("apx"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(tight[k] - ex) / ex < 0.001


def test_approx_count_distinct_rsd_bound(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("apx"),
    ).collect()[0]
    # rsd=0.02 is one sigma; 5 sigma of slack never flakes
    assert abs(row["apx"] - row["exact"]) / row["exact"] < 0.10


def test_map_in_arrow_surface(spark):
    """mapInArrow: RecordBatch-in/RecordBatch-out, schema honored,
    partition-parallel."""
    df = spark.range(1000).repartition(4)

    def double_id(batches):
        for b in batches:
            ids = b.column("id")
            yield pa.RecordBatch.from_arrays(
                [ids, pa.compute.multiply(ids, 2)], names=["id", "doubled"]
            )

    out = df.mapInArrow(double_id, schema="id long, doubled long")
    rows = out.orderBy("id").collect()
    assert len(rows) == 1000
    assert rows[7]["doubled"] == 14


def test_r30_shard_packing_is_invocation_deterministic(spark, sf_dir):
    """The two-phase prefix sum must give identical shards on repeated
    invocations (localCheckpoint pins the pid assignment WITHIN a run;
    ACROSS runs determinism comes from the hash-keyed range sort)."""
    from eeg_data_lake_spark.workload.curation import r30_token_shard_packing

    a = sorted(map(tuple, r30_token_shard_packing(spark, sf_dir).collect()))
    b = sorted(map(tuple, r30_token_shard_packing(spark, sf_dir).collect()))
    assert a == b
