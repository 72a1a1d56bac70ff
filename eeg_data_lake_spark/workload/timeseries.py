"""Time-series / epoch workload: the gold epoch-feature semantics
(SURVEY.md §2.5 W5, §2.4 A3-A7) on the events table, plus JSON props.

The EEG medallion's own epoch operators live in
eeg_data_lake_spark.pipeline.gold; these entries instantiate the same
floor-bucket epoching, RMS/moments, Hjorth lag-chains and QC flags on
driver data so every piece is oracle-verified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t

DAY = 86400.0


@register(
    "q21_daily_epoch_features",
    oracle="""
    SELECT user_id,
           CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS epoch_id,
           count(*)                                   AS n,
           round(sum(value), 4) / count(*)            AS mean,
           round(stddev_samp(value), 6)               AS std,
           round(sqrt(avg(value * value)), 6)         AS rms,
           round(max(value) - min(value), 6)          AS p2p
    FROM events
    GROUP BY user_id, epoch_id
    """,
    tags=("epoch", "gold-parity"),
)
def q21_daily_epoch_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-bucket epoching + windowed stats (W5 bucket mode + A4):
    the gold epoch-feature shape with 1-day buckets on a timestamp axis
    instead of 0.5 s buckets on a seconds axis."""
    e = t(spark, sf_dir, "events")
    x = F.col("value")
    return (
        # ts is TIMESTAMP_NTZ on disk; NTZ has no direct double cast, but
        # NTZ -> TIMESTAMP -> double is exact (session tz pinned to UTC).
        e.withColumn(
            "epoch_id",
            F.floor(F.col("ts").cast("timestamp").cast("double") / F.lit(DAY)).cast(
                "long"
            ),
        )
        .groupBy("user_id", "epoch_id")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.sum(x), 4) / F.count("*")).alias("mean"),
            F.round(F.stddev_samp(x), 6).alias("std"),
            F.round(F.sqrt(F.avg(x * x)), 6).alias("rms"),
            F.round(F.max(x) - F.min(x), 6).alias("p2p"),
        )
    )


@register(
    "q22_user_hjorth_params",
    oracle="""
    WITH d1 AS (
      SELECT user_id, ts, event_id, value,
             value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dx
      FROM events
    ), d2 AS (
      SELECT user_id, value, dx,
             dx - lag(dx) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS d2x
      FROM d1
    ), v AS (
      SELECT user_id,
             var_samp(value) AS var_x,
             var_samp(dx)    AS var_dx,
             var_samp(d2x)   AS var_d2x
      FROM d2 GROUP BY user_id
    )
    SELECT user_id,
           round(var_x, 6)  AS var_x,
           round(var_dx, 6) AS var_dx,
           round(var_d2x, 6) AS var_d2x,
           round(var_x, 6)  AS hj_activity,
           round(CASE WHEN var_x > 0 AND var_dx IS NOT NULL
                      THEN sqrt(var_dx / var_x) ELSE 0.0 END, 6) AS hj_mobility,
           round(CASE WHEN var_x > 0 AND var_dx > 0 AND var_d2x IS NOT NULL
                      THEN sqrt(var_d2x / var_dx) / sqrt(var_dx / var_x)
                      ELSE 0.0 END, 6) AS hj_complexity
    FROM v
    """,
    tags=("hjorth", "gold-parity"),
)
def q22_user_hjorth_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hjorth activity/mobility/complexity (A6 + W3 lag chains) — the
    exact formula chain of /root/reference/pilots/pilot_gold.py:88-103,
    per user_id over the ts-ordered event series."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.col("value")
    d = e.withColumn("dx", x - F.lag("value").over(w))
    d = d.withColumn("d2x", F.col("dx") - F.lag("dx").over(w))
    v = d.groupBy("user_id").agg(
        F.var_samp("value").alias("var_x"),
        F.var_samp("dx").alias("var_dx"),
        F.var_samp("d2x").alias("var_d2x"),
    )
    mobility = F.when(
        (F.col("var_x") > 0) & F.col("var_dx").isNotNull(),
        F.sqrt(F.col("var_dx") / F.col("var_x")),
    ).otherwise(F.lit(0.0))
    complexity = F.when(
        (F.col("var_x") > 0) & (F.col("var_dx") > 0) & F.col("var_d2x").isNotNull(),
        F.sqrt(F.col("var_d2x") / F.col("var_dx"))
        / F.sqrt(F.col("var_dx") / F.col("var_x")),
    ).otherwise(F.lit(0.0))
    return v.select(
        "user_id",
        F.round("var_x", 6).alias("var_x"),
        F.round("var_dx", 6).alias("var_dx"),
        F.round("var_d2x", 6).alias("var_d2x"),
        F.round("var_x", 6).alias("hj_activity"),
        F.round(mobility, 6).alias("hj_mobility"),
        F.round(complexity, 6).alias("hj_complexity"),
    )


@register(
    "q23_higher_moments_qc",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*)            AS n,
             avg(value)          AS m,
             stddev_pop(value)   AS sd_pop,
             stddev_samp(value)  AS sd,
             avg(value * value)  AS m2,
             avg(value * value * value) AS m3,
             avg(value * value * value * value) AS m4,
             max(value) - min(value) AS p2p
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round((m3 - 3 * m * m2 + 2 * m * m * m) / (sd_pop * sd_pop * sd_pop), 6)
               AS skew,
           round((m4 - 4 * m * m3 + 6 * m * m * m2 - 3 * m * m * m * m)
                 / (sd_pop * sd_pop * sd_pop * sd_pop) - 3.0, 6) AS kurt,
           (p2p <= 0.000001 OR coalesce(sd, 0) <= 0.000000000001) AS flatline_flag,
           (coalesce(sd, 0) > 100.0) AS highvar_flag
    FROM s
    """,
    tags=("moments", "qc"),
)
def q23_higher_moments_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness/kurtosis (A5) + the gold QC flags (F10). Spark's
    builtins are population moments (g1, excess g2); the oracle spells
    out the same moment formulas because DuckDB's bare skewness() is
    the sample-corrected variant."""
    e = t(spark, sf_dir, "events")
    x = F.col("value")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.skewness(x).alias("skew_raw"),
        F.kurtosis(x).alias("kurt_raw"),
        F.stddev_samp(x).alias("sd"),
        (F.max(x) - F.min(x)).alias("p2p"),
    )
    return s.select(
        "event_type",
        "n",
        F.round("skew_raw", 6).alias("skew"),
        F.round("kurt_raw", 6).alias("kurt"),
        (
            (F.col("p2p") <= F.lit(1e-6))
            | (F.coalesce(F.col("sd"), F.lit(0.0)) <= F.lit(1e-12))
        ).alias("flatline_flag"),
        (F.coalesce(F.col("sd"), F.lit(0.0)) > F.lit(100.0)).alias("highvar_flag"),
    )


@register(
    "q24_json_props",
    oracle="""
    WITH p AS (
      -- integer-pattern guard, matching Spark's try_cast(int): DuckDB
      -- CAST ROUNDS '3.5' to 4 where Spark yields NULL, and throws on
      -- non-numeric strings where Spark yields NULL
      SELECT event_type,
             CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                      '^-?[0-9]+$')
                  THEN CAST(json_extract_string(props, '$.k') AS INTEGER)
             END AS k
      FROM events
    )
    SELECT event_type,
           CAST(sum(k) AS BIGINT)              AS sum_k,
           CAST(sum(k) AS DOUBLE) / count(k)   AS avg_k,
           CAST(max(k) AS INTEGER)             AS max_k
    FROM p
    GROUP BY event_type
    """,
    tags=("json",),
)
def q24_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface (engine extension per SURVEY.md §2.7 note):
    get_json_object over the events.props string column."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            # integer sum / count: exact on both engines, no rounding needed
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q25_zero_crossing_analog",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dv
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id,
             CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END AS sign
      FROM d
    ), p AS (
      SELECT user_id, sign,
             lag(sign) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_sign
      FROM s
    )
    SELECT user_id,
           CAST(sum(CASE WHEN prev_sign IS NOT NULL AND sign <> prev_sign
                          AND sign <> 0 AND prev_sign <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS direction_changes
    FROM p
    GROUP BY user_id
    """,
    tags=("zcr", "gold-parity"),
)
def q25_zero_crossing_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-change counting over an ordered series (W3+A7, the
    zero-crossing-rate chain of /root/reference/pilots/pilot_gold.py:54-77)
    applied to event-value deltas (values are all positive, so the
    crossing signal is the delta's direction)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn("dv", F.col("value") - F.lag("value").over(w))
    sign = F.when(F.col("dv") > 0, 1).when(F.col("dv") < 0, -1).otherwise(0)
    d = d.withColumn("sign", sign).withColumn("prev_sign", F.lag(sign).over(w))
    change = F.when(
        F.col("prev_sign").isNotNull()
        & (F.col("sign") != F.col("prev_sign"))
        & (F.col("sign") != 0)
        & (F.col("prev_sign") != 0),
        1,
    ).otherwise(0)
    return d.groupBy("user_id").agg(F.sum(change).alias("direction_changes"))


@register(
    "r01_multires_rollup",
    oracle="""
    WITH h AS (
      SELECT 'hour' AS res, CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket,
             COUNT(*) AS n_events, round(SUM(value), 4) AS total_value
      FROM events GROUP BY 2
    ), d AS (
      SELECT 'day' AS res, CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS bucket,
             COUNT(*) AS n_events, round(SUM(value), 4) AS total_value
      FROM events GROUP BY 2
    ), w AS (
      SELECT 'week' AS res, CAST(CAST(date_trunc('week', ts) AS TIMESTAMP) AS VARCHAR) AS bucket,
             COUNT(*) AS n_events, round(SUM(value), 4) AS total_value
      FROM events GROUP BY 2
    )
    SELECT * FROM h UNION ALL SELECT * FROM d UNION ALL SELECT * FROM w
    ORDER BY res, bucket
    """,
    tags=("timeseries", "rollup", "hypertable"),
)
def r01_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution continuous aggregate: the same
    events rolled to hour / day / week buckets in one result, tagged by
    resolution (the TimescaleDB continuous-aggregate shape, and the
    gold-layer pattern for dashboards that zoom). Plan: ONE scan + one
    hash agg at the finest grain, then the coarser resolutions
    re-aggregate the hourly partials — day sums hours, week sums days —
    so raw events are touched once no matter how many resolutions are
    served; the re-aggregation inputs are |hour buckets| rows, which is
    why continuous aggregates stay cheap at 100 TB. (Named r01: it
    sorts after q50, keeping the driver's 50-entry oracle window on
    q01–q50; the oracle checks it locally like every beyond-window
    query.)"""
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sv"),
        )
        # eager localCheckpoint, NOT persist: a bare persist with no
        # unpersist pins cached blocks for the session lifetime per
        # invocation (the round-2 leak); checkpoint blocks are
        # reclaimed by the ContextCleaner once the frame is collected
        .localCheckpoint(eager=True)
    )

    def level(df, col, res):
        return df.select(
            F.lit(res).alias("res"),
            F.col(col).cast("string").alias("bucket"),
            "n_events",
            F.round("total_value", 4).alias("total_value"),
        )

    h = hourly.select(
        F.col("h"), "n_events", F.col("sv").alias("total_value")
    )
    d = hourly.groupBy(F.date_trunc("day", "h").alias("h")).agg(
        F.sum("n_events").alias("n_events"), F.sum("sv").alias("total_value")
    )
    wk = d.groupBy(F.date_trunc("week", "h").alias("h")).agg(
        F.sum("n_events").alias("n_events"), F.sum("total_value").alias("total_value")
    )
    out = (
        level(h, "h", "hour")
        .unionByName(level(d, "h", "day"))
        .unionByName(level(wk, "h", "week"))
        .orderBy("res", "bucket")
    )
    return out
