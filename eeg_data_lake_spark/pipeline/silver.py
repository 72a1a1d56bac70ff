"""Silver: per-(trial, channel) z-score normalization + outlier drop.

Semantics of /root/reference/main/silver.py:41-73, re-expressed:
- trial_id = xxhash64(synset, image_id, take, session) — stable 64-bit
  composite key (F14), deterministic across Spark versions.
- z-score via an unbounded window over (trial_id, channel) (W1) with
  the std=0 guard (F10) — the reference's pilot variant omits the guard
  (/root/reference/pilots/pilot_silver.py:90) and divides by zero; the
  guarded form is canonical here.
- |z| > threshold rows are flagged and dropped (P7).

Scale: the window shuffle on (trial_id, channel) is THE silver-stage
exchange. trial_id is a 64-bit hash → uniformly distributed, so no salt
needed; one trial-channel is ≤ a few thousand rows, so no partition can
blow memory regardless of total volume. The subsequent write partitions
by (synset, channel) — a different key — so the writer gets its own
exchange; callers that want to avoid it can pass the silver DataFrame
straight into gold, which re-aggregates on the window's key and reuses
the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Z_OUTLIER_THRESHOLD = 6.0  # /root/reference/main/silver.py:59


def with_trial_id(bronze: DataFrame) -> DataFrame:
    """Stable composite trial key (/root/reference/main/silver.py:41-44).

    Files whose names didn't parse (bronze deliberately NULLs their
    metadata instead of failing ingest) fall back to hashing the
    source path: Spark's xxhash64 SKIPS null arguments, so without the
    fallback every unparseable file would share one constant trial_id
    — z-scoring unrelated files as a single group AND growing that
    window partition without bound as bad files accumulate. Parseable
    files hash exactly as before (reference parity unchanged)."""
    meta_ok = (
        F.col("synset").isNotNull()
        | F.col("image_id").isNotNull()
        | F.col("take").isNotNull()
        | F.col("session").isNotNull()
    )
    return bronze.withColumn(
        "trial_id",
        F.when(
            meta_ok, F.xxhash64("synset", "image_id", "take", "session")
        ).otherwise(F.xxhash64("source_file")),
    )


def zscore(df: DataFrame, value_col: str = "value", keys: tuple = ("trial_id", "channel")) -> DataFrame:
    """Guarded per-group z-score without losing row grain (W1 + F10)."""
    w = Window.partitionBy(*keys)
    mean = F.mean(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    guarded = F.when(
        std.isNull() | (std == 0), F.lit(0.0)
    ).otherwise((F.col(value_col) - mean) / std)
    return df.withColumn("z", guarded)


def silver_bandpass(
    silver: DataFrame,
    lowcut: float = 1.0,
    highcut: float = 40.0,
    fs: float = 128.0,
    order: int = 4,
) -> DataFrame:
    """Silver variant with a zero-phase Butterworth band-pass applied
    per (trial_id, channel) — the reference's out-of-Spark pandas path
    (/root/reference/bronze-to-silver.py:19-34, U1) run as a grouped-map
    pandas UDF inside the cluster. Adds ``value_filt``."""
    from eeg_data_lake_spark.functions.signal import bandpass_by_group

    return bandpass_by_group(
        silver,
        group_cols=("trial_id", "channel"),
        order_col="sample_idx",
        value_col="value",
        lowcut=lowcut,
        highcut=highcut,
        fs=fs,
        order=order,
    )


def silver_from_bronze(
    bronze: DataFrame,
    z_threshold: float = Z_OUTLIER_THRESHOLD,
    keep_outliers: bool = False,
) -> DataFrame:
    """bronze → silver (clean) table."""
    df = zscore(with_trial_id(bronze))
    df = df.withColumn("is_outlier", F.abs(F.col("z")) > F.lit(z_threshold))
    if not keep_outliers:
        df = df.filter(~F.col("is_outlier"))
    cols = [
        "trial_id", "source_file", "headset", "synset", "image_id", "take",
        "session", "channel", "sample_idx", "value", "time_sec", "z", "is_outlier",
    ]
    return df.select(*[c for c in cols if c in df.columns])
