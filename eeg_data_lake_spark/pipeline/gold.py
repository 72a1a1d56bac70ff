"""Gold feature tables.

Two outputs, matching the reference's semantics:

1. ``gold_trial_channel`` — one row per (trial, channel) with the full
   statistical feature set of /root/reference/main/gold.py:40-81
   (counts, time bounds, mean/std/min/max, approximate median & p95,
   z-stats, samples_per_sec).

2. ``gold_epoch_features`` — one row per (trial, channel, epoch) with
   windowed stats, Hjorth parameters and QC flags
   (/root/reference/pilots/pilot_gold.py:44-115). Two epoching modes:

   - ``mode="bucket"`` (bug-compatible): epoch = floor(time/STEP) —
     the reference *intends* 1 s windows with 50 % overlap but its
     floor-bucketing assigns each sample to exactly one 0.5 s bucket
     and its range filter is vacuous (SURVEY.md §2.5 W5 note). The
     win_end label overstates the window by WIN-STEP, faithfully.
   - ``mode="sliding"`` (correct semantics): true overlapping windows —
     each sample lands in every window covering it, implemented by
     exploding per-sample over the (WIN/STEP) candidate window starts.
     This is the batch analogue of F.window(ts, win, step) but works on
     a double seconds axis instead of timestamps.

Scale: both gold paths are single-shuffle hash aggregations on keys
that extend silver's window key (trial_id, channel), so when chained
bronze→silver→gold Spark reuses the exchange; AQE coalesces the tiny
final partitions. percentile_approx is a fixed-size GK sketch per
group — memory-safe at any group cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark import schemas

# /root/reference/pilots/pilot_gold.py:4-7
WIN_SEC = 1.0
STEP_SEC = 0.5
FLATLINE_P2P = 1e-6
FLATLINE_STD = 1e-12
HIGHVAR_STD = 100.0


def gold_trial_channel(silver: DataFrame) -> DataFrame:
    """Per-(trial, channel) aggregate features (A1/A2)."""
    keys = ["trial_id", "channel", "synset", "image_id", "take", "session", "headset"]
    keys = [k for k in keys if k in silver.columns]
    agg = silver.groupBy(*keys).agg(
        F.count("*").alias("n_samples"),
        F.min("time_sec").alias("t_start_sec"),
        F.max("time_sec").alias("t_end_sec"),
        F.mean("value").alias("mean_value"),
        F.stddev_samp("value").alias("std_value"),
        F.mean(F.abs(F.col("value"))).alias("mean_abs_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.percentile_approx("value", 0.5).alias("median_value"),
        F.percentile_approx("value", 0.95).alias("p95_value"),
        F.mean("z").alias("mean_z"),
        F.stddev_samp("z").alias("std_z"),
        F.min("z").alias("min_z"),
        F.max("z").alias("max_z"),
    )
    return (
        agg.withColumn("duration_sec", F.col("t_end_sec") - F.col("t_start_sec"))
        .withColumn(
            "duration_from_count_sec", F.col("n_samples") / F.lit(float(schemas.FS))
        )
        .withColumn(
            "samples_per_sec",
            F.when(F.col("duration_sec") > 0, F.col("n_samples") / F.col("duration_sec")),
        )
    )


def assign_epochs(
    df: DataFrame,
    mode: str = "bucket",
    win_sec: float = WIN_SEC,
    step_sec: float = STEP_SEC,
    time_col: str = "time_sec",
) -> DataFrame:
    """Attach epoch_id / win_start_sec / win_end_sec per sample."""
    if mode == "bucket":
        df = df.withColumn(
            "epoch_id", F.floor(F.col(time_col) / F.lit(step_sec)).cast("long")
        )
        df = df.withColumn("win_start_sec", F.col("epoch_id") * F.lit(step_sec))
        df = df.withColumn("win_end_sec", F.col("win_start_sec") + F.lit(win_sec))
        # The reference's range filter (pilot_gold.py:50) is vacuously
        # true under floor-bucketing; kept for shape parity.
        return df.where(
            (F.col(time_col) >= F.col("win_start_sec"))
            & (F.col(time_col) < F.col("win_end_sec"))
        )
    if mode == "sliding":
        n_overlap = int(round(win_sec / step_sec))
        # every window with start in (t - win, t] on the step grid
        df = df.withColumn(
            "epoch_id",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.lit(0),
                        F.floor(F.col(time_col) / F.lit(step_sec)).cast("long")
                        - F.lit(n_overlap - 1),
                    ),
                    F.floor(F.col(time_col) / F.lit(step_sec)).cast("long"),
                )
            ),
        )
        df = df.withColumn("win_start_sec", F.col("epoch_id") * F.lit(step_sec))
        df = df.withColumn("win_end_sec", F.col("win_start_sec") + F.lit(win_sec))
        return df.where(
            (F.col(time_col) >= F.col("win_start_sec"))
            & (F.col(time_col) < F.col("win_end_sec"))
        )
    raise ValueError(f"unknown epoch mode {mode!r}")


def gold_epoch_features(
    silver: DataFrame,
    mode: str = "bucket",
    value_col: str = "value",
    keys: tuple = ("trial_id", "channel"),
) -> DataFrame:
    """Per-epoch stats + Hjorth parameters + QC flags (W3/W5, A3-A7).

    One ordered-window pass derives sign/lag chains, then a single
    grouped aggregation computes basic stats AND Hjorth moments —
    unlike the reference, which runs two aggregations from a cached
    DataFrame and re-joins (/root/reference/pilots/pilot_gold.py:62-106);
    fusing them removes one shuffle and the join entirely.
    """
    df = assign_epochs(silver, mode=mode)
    gkeys = [*keys, "epoch_id", "win_start_sec", "win_end_sec"]
    w = Window.partitionBy(*gkeys).orderBy("sample_idx")

    x = F.col(value_col)
    sign = F.when(x > 0, 1).when(x < 0, -1).otherwise(0)
    df = df.withColumn("_sign", sign)
    df = df.withColumn("_prev_sign", F.lag("_sign").over(w))
    df = df.withColumn(
        "_sign_change",
        F.when(
            F.col("_prev_sign").isNotNull()
            & (F.col("_sign") != F.col("_prev_sign"))
            & (F.col("_sign") != 0)
            & (F.col("_prev_sign") != 0),
            1,
        ).otherwise(0),
    )
    df = df.withColumn("_dx", x - F.lag(value_col).over(w))
    df = df.withColumn("_d2x", F.col("_dx") - F.lag("_dx").over(w))

    agg = df.groupBy(*gkeys).agg(
        F.count("*").alias("n"),
        F.sum(F.when(x.isNull(), 1).otherwise(0)).alias("n_nan"),
        F.mean(x).alias("mean"),
        F.stddev_samp(x).alias("std"),
        F.sqrt(F.avg(x * x)).alias("rms"),
        (F.max(x) - F.min(x)).alias("p2p"),
        F.skewness(x).alias("skew"),
        F.kurtosis(x).alias("kurtosis"),
        F.sum("_sign_change").alias("zcr_count"),
        F.variance(x).alias("var_x"),
        F.variance("_dx").alias("var_dx"),
        F.variance("_d2x").alias("var_d2x"),
    )
    agg = (
        agg.withColumn("nan_ratio", F.col("n_nan") / F.col("n"))
        .withColumn("zcr", F.col("zcr_count") / F.col("n"))
        .withColumn("hj_activity", F.col("var_x"))
        .withColumn(
            "hj_mobility",
            F.when(
                (F.col("var_x") > 0) & F.col("var_dx").isNotNull(),
                F.sqrt(F.col("var_dx") / F.col("var_x")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "_mobility_dx",
            F.when(
                (F.col("var_dx") > 0) & F.col("var_d2x").isNotNull(),
                F.sqrt(F.col("var_d2x") / F.col("var_dx")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "hj_complexity",
            F.when(
                F.col("hj_mobility") > 0, F.col("_mobility_dx") / F.col("hj_mobility")
            ).otherwise(F.lit(0.0)),
        )
        .drop("_mobility_dx")
        .withColumn(
            "flatline_flag",
            (F.col("p2p") <= F.lit(FLATLINE_P2P))
            | (F.coalesce(F.col("std"), F.lit(0.0)) <= F.lit(FLATLINE_STD)),
        )
        .withColumn(
            "highvar_flag", F.coalesce(F.col("std"), F.lit(0.0)) > F.lit(HIGHVAR_STD)
        )
    )
    return agg
