"""Bloom filter build/probe: no false negatives, bounded FP rate,
prefilter precedes the exchange, oracle parity via r50."""

from __future__ import annotations

from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.bloomjoin import (
    bloom_prefiltered_join,
    build_bloom_words,
    might_contain,
)
from eeg_data_lake_spark.plans import explain_string


def test_no_false_negatives_and_fp_bounded(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = build_bloom_words(keys, "k", n_bits=1 << 16)
    # every inserted key must pass
    hits = (
        spark.range(0, 2000)
        .select(F.col("id").alias("k"))
        .filter(might_contain(F.col("k"), words, n_bits=1 << 16))
        .count()
    )
    assert hits == 2000
    # disjoint probe keys: FP rate must stay near theory (k·n/m ≈ 0.15
    # load → well under 2%)
    fp = (
        spark.range(1_000_000, 1_020_000)
        .select(F.col("id").alias("k"))
        .filter(might_contain(F.col("k"), words, n_bits=1 << 16))
        .count()
    )
    assert fp / 20_000 < 0.02


def test_join_result_exact_despite_fps(spark):
    large = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    small = spark.range(0, 50_000, 509).select(F.col("id").alias("k"))
    got = sorted(
        map(tuple, bloom_prefiltered_join(large, small, "k", n_bits=1 << 14).collect())
    )
    want = sorted(map(tuple, large.join(small, "k").collect()))
    assert got == want and len(want) > 0


def test_prefilter_sits_below_the_join(spark):
    large = spark.range(0, 10_000).select(F.col("id").alias("k"))
    small = spark.range(0, 10_000, 997).select(F.col("id").alias("k"))
    plan = explain_string(bloom_prefiltered_join(large, small, "k", n_bits=1 << 14))
    # the probe arithmetic must appear as a Filter in the large side's
    # scan stage (shiftleft probes), not after the join
    assert "shiftleft" in plan
    join_pos = max(plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
    assert join_pos != -1
    assert plan.find("shiftleft") > 0


def test_non_multiple_of_64_bits_rejected(spark):
    """A partial last word would make the probe read past the bitmap
    (NULL -> no-match), silently dropping matching rows — refused."""
    import pytest

    from eeg_data_lake_spark.operators.bloomjoin import build_bloom_words

    keys = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_words(keys, "k", n_bits=1_000_010)
