"""AQE skew-join: prove Spark's runtime skew mitigation actually FIRES
on a skewed shuffle join, not just that the flag is set. This is the
engine-level alternative to the explicit salting operator
(operators/skew.py, q55): salting rewrites the query; AQE re-plans the
shuffle at runtime from observed partition sizes — the 100 TB default
posture (hot keys exist in every real corpus: empty-string text, the
dominant language, the null-ish user).

The thresholds are scaled down (the skew detector compares partition
bytes against spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes
AND factor × median), because at test scale no partition reaches the
256 MB production default — the *mechanism* under test is identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    # force a sort-merge join (broadcast would dodge the shuffle
    # entirely and nothing could skew)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # scale the skew detector down to fixture bytes
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # keep coalescing from merging the skewed partition away first
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    # apply the skew rewrite even where it would add a shuffle for a
    # downstream distribution requirement (at test scale that tradeoff
    # is always worth it; the default heuristic weighs real bytes)
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # 95% of left rows share key 0 (with a fat payload so the skewed
    # partition crosses the scaled-down byte threshold); right is a
    # small dim table but broadcast is disabled, so this is the
    # shuffle-join-with-a-hot-key shape
    left = spark.range(0, 120_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0))
        .otherwise(F.col("id") % 32)
        .alias("k"),
        F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
    )
    right = spark.range(0, 32).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    # no aggregation downstream: a parent that *requires* the join's
    # hash distribution (e.g. groupBy on the join key) makes AQE skip
    # the skew split to avoid re-shuffling — the classic reason
    # "skewJoin.enabled=true" silently does nothing
    joined = left.join(right, "k").select("k", "payload", "dim")
    rows = joined.collect()
    # correctness first: every left row matched exactly one right key,
    # and the hot key kept 19/20 of rows plus the id%20==0 ids that
    # also hash to key 0 (id%32==0 → id%160==0 → 750 of them)
    assert len(rows) == 120_000
    assert sum(1 for r in rows if r["k"] == 0) == 114_000 + 750
    # ... and the executed adaptive plan actually split the skewed
    # partition (the join node is tagged skew=true only when the
    # OptimizeSkewedJoin rule rewrote it at runtime)
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:2000]


def test_salted_join_matches_plain_under_skew(spark, skew_confs):
    """The explicit salting operator and the AQE path agree on results
    — users can pick either mitigation for the same query."""
    from eeg_data_lake_spark.operators.skew import salted_join

    left = spark.range(0, 50_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    right = spark.range(0, 3).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w")
    )
    plain = left.join(right, "k").agg(F.sum(F.col("v") + F.col("w"))).collect()
    salted = (
        salted_join(left, right, ["k"], salt_buckets=8)
        .agg(F.sum(F.col("v") + F.col("w")))
        .collect()
    )
    assert plain == salted
