"""End-to-end medallion tests on deterministic fixtures.

Property assertions come from the analytically-known fixture signals
(FIXTURES.md §1): sinusoid of amplitude 1 + 0.1σ noise has mean≈0,
std≈sqrt(0.5+0.01)≈0.714, rms≈std, and ~2f sign changes per second.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark import fixtures, schemas
from eeg_data_lake_spark.pipeline import (
    bronze_from_lines,
    bronze_from_wide_csv,
    gold_epoch_features,
    gold_trial_channel,
    silver_from_bronze,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mindbigdata")
    fixtures.write_mindbigdata_csvs(str(d), n_files=2, seconds=2.0)
    return str(d)


@pytest.fixture(scope="module")
def bronze(spark, raw_dir):
    return bronze_from_lines(spark, raw_dir).cache()


@pytest.fixture(scope="module")
def clean_bronze(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mindbigdata_clean")
    fixtures.write_mindbigdata_csvs(str(d), n_files=2, seconds=2.0, include_bad_rows=False)
    return bronze_from_lines(spark, str(d)).cache()


def test_bronze_schema_and_counts(bronze):
    assert [f.name for f in bronze.schema.fields] == [
        f.name for f in schemas.BRONZE_SCHEMA.fields
    ]
    n_expected = 2 * 5 * 256  # 2 files x 5 channels x 2s*128Hz
    # +2 good samples from the bad row (one token is non-numeric → dropped)
    assert bronze.count() == n_expected + 2 * 2
    # unknown channel dropped by whitelist
    assert bronze.filter(F.col("channel") == "BOGUS").count() == 0
    # sample_idx from posexplode: 0-based dense per (file, channel row)
    row = bronze.filter(
        (F.col("channel") == "AF4") & (F.col("sample_idx") == 0)
    ).first()
    assert row is not None and row.time_sec == 0.0


def test_bronze_filename_metadata(bronze):
    meta = (
        bronze.select("headset", "synset", "image_id", "take", "session")
        .distinct()
        .collect()
    )
    synsets = {m.synset for m in meta}
    assert {"n00000000", "n00000001"} <= synsets
    assert all(m.headset == "Insight" for m in meta if m.synset in synsets)


def test_silver_zscore_properties(spark, bronze):
    silver = silver_from_bronze(bronze)
    stats = (
        silver.filter(F.col("sample_idx") < 256)  # the clean sinusoid rows
        .groupBy("trial_id", "channel")
        .agg(
            F.mean("z").alias("mz"),
            F.stddev_samp("z").alias("sz"),
            F.mean("value").alias("mv"),
            F.stddev_samp("value").alias("sv"),
        )
        .collect()
    )
    assert len(stats) == 10  # 2 trials x 5 channels
    for r in stats:
        assert abs(r.mz) < 0.05
        assert abs(r.sz - 1.0) < 0.05
        assert abs(r.mv) < 0.15
        assert abs(r.sv - math.sqrt(0.51)) < 0.12


def test_silver_guard_and_outlier_paths(spark):
    rows = [
        ("f", "h", "s", 1, 1, 1, "AF3", i, float(v), i / 128.0)
        for i, v in enumerate([1.0] * 10)  # flatline → std=0 → z=0
    ] + [
        ("f", "h", "s", 1, 1, 1, "AF4", 0, 5.0, 0.0)  # single sample → std null
    ]
    cols = [
        "source_file", "headset", "synset", "image_id", "take", "session",
        "channel", "sample_idx", "value", "time_sec",
    ]
    bronze = spark.createDataFrame(rows, cols)
    silver = silver_from_bronze(bronze, keep_outliers=True)
    zs = {r.channel: r.z for r in silver.select("channel", "z").distinct().collect()}
    assert zs["AF3"] == 0.0 and zs["AF4"] == 0.0
    assert silver.filter(F.col("is_outlier")).count() == 0


def test_gold_trial_channel_features(spark, bronze):
    gold = gold_trial_channel(silver_from_bronze(bronze))
    rows = gold.collect()
    assert len(rows) == 10
    for r in rows:
        assert r.n_samples >= 256
        assert r.t_start_sec == 0.0
        assert abs(r.mean_value) < 0.15
        assert r.min_value <= r.median_value <= r.p95_value <= r.max_value
        assert r.samples_per_sec == pytest.approx(128.0, rel=0.02)


def test_gold_epoch_features_bucket_mode(spark, clean_bronze):
    silver = silver_from_bronze(clean_bronze).filter(F.col("sample_idx") < 256)
    feats = gold_epoch_features(silver, mode="bucket").collect()
    # 2s at 0.5s buckets = 4 epochs per (trial, channel)
    assert len(feats) == 10 * 4
    by_ch = {}
    for r in feats:
        by_ch.setdefault(r.channel, []).append(r)
        assert not r.flatline_flag and not r.highvar_flag
        assert r.n == 64 and r.nan_ratio == 0.0
        assert r.hj_mobility > 0 and r.hj_complexity > 0
    # zero-crossing rate tracks 2*freq per second: zcr_count in a 0.5s
    # epoch ≈ freq (sin crosses zero twice per cycle)
    for ch, wave, freq in fixtures.CHANNEL_WAVES:
        mean_zcr = sum(r.zcr_count for r in by_ch[ch]) / len(by_ch[ch])
        assert abs(mean_zcr - freq) <= 2.5, (ch, mean_zcr, freq)


def test_gold_epoch_sliding_mode_duplicates_rows(spark, clean_bronze):
    silver = silver_from_bronze(clean_bronze).filter(F.col("sample_idx") < 256)
    bucket = gold_epoch_features(silver, mode="bucket")
    sliding = gold_epoch_features(silver, mode="sliding")
    # epoch ids coincide (0..3) but true 1s windows hold up to 128
    # samples each: interior samples appear in 2 overlapping windows,
    # so total per-epoch sample mass roughly doubles
    sum_bucket = bucket.agg(F.sum("n")).first()[0]
    sum_sliding = sliding.agg(F.sum("n")).first()[0]
    assert sum_sliding > 1.5 * sum_bucket
    assert sliding.filter(F.col("n") == 128).count() > 0


def test_pilot_wide_ingest(spark, tmp_path):
    d = tmp_path / "pilot"
    fixtures.write_pilot_trials(str(d), n_trials=2, seconds=1.0)
    long = bronze_from_wide_csv(spark, str(d))
    assert long.count() == 2 * 5 * 128
    assert set(r.trial_id for r in long.select("trial_id").distinct().collect()) == {0, 1}
    first = long.filter((F.col("trial_id") == 0) & (F.col("channel") == "AF3")).orderBy(
        "sample_idx"
    )
    vals = [r.value for r in first.limit(3).collect()]
    expected = fixtures.make_signal_df(1.0, seed=100)["AF3"].tolist()[:3]
    for got, want in zip(vals, expected):
        assert got == pytest.approx(want, abs=1e-6)
