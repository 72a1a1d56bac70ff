"""Signal-processing workload entries (SURVEY.md §2.9 U1/U2).

These exercise the grouped-map pandas-UDF path on the driver's events
table (the EEG analog: value series per user ordered by time). The IIR
forward-backward filter is not expressible in ANSI SQL, so q43 is a
rows-only check; the *medallion* form of the same operator
(pipeline.silver_bandpass) is covered by numeric unit tests against
known sinusoids in tests/test_signal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.signal import (
    bandpass_by_group,
    standardize_by_group,
)
from eeg_data_lake_spark.workload.registry import register, t


@register(
    "q94_bandpass_user_series",
    oracle=None,  # IIR filtfilt is not SQL-expressible → rows-only
    tags=("signal", "pandas-udf"),
)
def q94_bandpass_user_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-phase Butterworth band-pass of each user's event-value
    series (order by ts, event_id; unit sample rate, pass band
    0.05–0.4 cycles/sample). Grouped-map pandas UDF: one Arrow batch
    per user, shuffle keyed on user_id — linear scale-out, no skew
    hazard (user series are bounded)."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = bandpass_by_group(
        e,
        group_cols=("user_id",),
        order_col=("ts", "event_id"),
        value_col="value",
        lowcut=0.05,
        highcut=0.4,
        fs=1.0,
        order=4,
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("value_filt", 6).alias("value_filt"),
    )


@register(
    "q44_pandas_vs_window_zscore",
    oracle="""
    WITH z AS (
      SELECT user_id, event_id,
             CASE WHEN stddev_pop(value) OVER (PARTITION BY user_id) = 0
                  THEN 0.0
                  ELSE (value - avg(value) OVER (PARTITION BY user_id))
                       / stddev_pop(value) OVER (PARTITION BY user_id)
             END AS zval
      FROM events
    )
    SELECT user_id, event_id, round(zval, 6) AS z FROM z
    """,
    tags=("signal", "pandas-udf", "equivalence"),
)
def q44_pandas_vs_window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 equivalence surfaced as a verified query: the pandas-path
    standardization (grouped-map UDF, population std — matching
    sklearn.StandardScaler in /root/reference/bronze-to-silver.py:36-38)
    must reproduce the SQL window z-score exactly. The oracle IS the
    window form, so the hash-match proves both paths agree."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = standardize_by_group(e, group_cols=("user_id",), value_col="value")
    return out.select(
        "user_id", "event_id", F.round("value_std", 6).alias("z")
    )


@register(
    "q87_band_power_user",
    oracle=None,  # FFT spectral density is not SQL-expressible → rows-only
    tags=("signal", "spectral", "pandas-udf"),
)
def q87_band_power_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain band power of each user's event-value series
    (order by ts, event_id; unit sample rate, so the bands are in
    cycles/sample below the 0.5 Nyquist). One grouped-map pandas-UDF
    pass computing the rfft periodogram per user — same plan shape and
    partition pinning as the Butterworth q94; kernel validated by
    Parseval identity and sine-peak tests (tests/test_spectral.py)."""
    from eeg_data_lake_spark.functions.spectral import band_power_by_group

    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = band_power_by_group(
        e,
        group_cols=("user_id",),
        order_col=("ts", "event_id"),
        value_col="value",
        fs=1.0,
        bands={"low": (0.0, 0.1), "mid": (0.1, 0.25), "high": (0.25, 0.5)},
    )
    cols = [F.col("user_id"), F.col("n_samples")]
    for b in ("low", "mid", "high"):
        cols.append(F.round(f"{b}_power", 6).alias(f"{b}_power"))
        cols.append(F.round(f"{b}_rel", 6).alias(f"{b}_rel"))
    return out.select(*cols)
