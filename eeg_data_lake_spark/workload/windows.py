"""Window-function workload (SURVEY.md §2.5 W1-W4).

These re-express the medallion's window semantics on the driver's
tables so the DuckDB oracle can verify them: the silver z-score (W1)
becomes a per-customer z-score of order totals, the per-file sample
index (W2) becomes first-order-per-customer, the lag chains (W3)
become per-user event deltas.

Scale: every window here partitions by a high-cardinality key
(custkey/user_id), so state per partition is bounded and the single
exchange-and-sort is the whole cost. None uses an unpartitioned window
— the thing that dies at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t


@register(
    "q16_order_total_zscore",
    oracle="""
    WITH stats AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             avg(o_totalprice)         OVER (PARTITION BY o_custkey) AS m,
             stddev_samp(o_totalprice) OVER (PARTITION BY o_custkey) AS s
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           round(CASE WHEN s IS NULL OR s = 0 THEN 0.0
                      ELSE (o_totalprice - m) / s END, 6) AS z
    FROM stats
    """,
    tags=("window", "silver-parity"),
)
def q16_order_total_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver z-score semantics (W1 + F10 guard) on orders: unbounded
    window stats per customer without losing row grain — the exact shape
    of /root/reference/main/silver.py:45-56, verified by oracle."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    m = F.mean("o_totalprice").over(w)
    s = F.stddev_samp("o_totalprice").over(w)
    z = F.when(s.isNull() | (s == 0), F.lit(0.0)).otherwise(
        (F.col("o_totalprice") - m) / s
    )
    return o.select("o_orderkey", "o_custkey", F.round(z, 6).alias("z"))


@register(
    "q17_first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey,
           o_orderdate AS first_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    tags=("window", "topk-per-group"),
)
def q17_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking (W2) with a deterministic composite sort key —
    the engine's replacement for the reference's read-order
    monotonically_increasing_id hazard (SURVEY.md §2.5 W4)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("o_orderdate").alias("first_orderdate"),
        )
    )


@register(
    "q18_user_event_deltas",
    oracle="""
    WITH d AS (
      SELECT user_id,
             value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dv
      FROM events
    )
    SELECT user_id,
           count(dv)                          AS n_deltas,
           round(sum(dv), 4) / count(dv)      AS mean_delta,
           round(stddev_samp(dv), 6)          AS std_delta,
           round(sum(abs(dv)), 4) / count(dv) AS mean_abs_delta
    FROM d
    GROUP BY user_id
    """,
    tags=("window", "lag"),
)
def q18_user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered lag chain (W3) + aggregate — the Hjorth-derivative shape
    of /root/reference/pilots/pilot_gold.py:82-85 on the events table."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn("dv", F.col("value") - F.lag("value").over(w))
    return d.groupBy("user_id").agg(
        F.count("dv").alias("n_deltas"),
        # canonical avg (see q01): round(sum,4)/count is bit-stable
        (F.round(F.sum("dv"), 4) / F.count("dv")).alias("mean_delta"),
        F.round(F.stddev_samp("dv"), 6).alias("std_delta"),
        (F.round(F.sum(F.abs(F.col("dv"))), 4) / F.count("dv")).alias("mean_abs_delta"),
    )


@register(
    "q19_user_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 1 HOUR
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*)                         AS n_events
    FROM g
    GROUP BY user_id
    """,
    tags=("window", "sessionization"),
)
def q19_user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag(ts) + gap threshold (the batch form of
    session_window): gap > 1h starts a new session."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # NTZ timestamps have no direct double cast; route through TIMESTAMP
    # (session tz pinned UTC) to get epoch seconds for the gap test.
    tsec = F.col("ts").cast("timestamp").cast("double")
    prev_sec = prev.cast("timestamp").cast("double")
    new_session = F.when(
        prev.isNull() | (tsec - prev_sec > 3600.0),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q20_event_type_pivot",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 4)
             / count(CASE WHEN event_type = 'click'    THEN value END) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 4)
             / count(CASE WHEN event_type = 'error'    THEN value END) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4)
             / count(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 4)
             / count(CASE WHEN event_type = 'signup'   THEN value END) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 4)
             / count(CASE WHEN event_type = 'view'     THEN value END) AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("pivot",),
)
def q20_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (A9, the trial×channel-feature matrix shape of
    /root/reference/test_train.py:55-59). Pivot values are pinned
    explicitly so Spark skips the extra distinct-discovery job."""
    e = t(spark, sf_dir, "events")
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.round(F.sum("value"), 4) / F.count("value"))
    )
    return piv


@register(
    "q61_rolling_frame_stats",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER w, 6) AS rolling_avg,
           round(min(value) OVER w, 4) AS rolling_min,
           round(max(value) OVER w, 4) AS rolling_max,
           CAST(count(*)  OVER w AS BIGINT) AS rolling_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "rolling"),
)
def q61_rolling_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame (the window surface beyond W1's default
    full-partition frame): trailing 4-event rolling stats per user.
    Physical plan is the same single exchange+sort as any window — the
    frame only changes the in-partition aggregation buffer."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
        F.round(F.min("value").over(w), 4).alias("rolling_min"),
        F.round(F.max("value").over(w), 4).alias("rolling_max"),
        F.count("*").over(w).alias("rolling_n"),
    )


@register(
    "q62_native_session_windows",
    oracle="""
    WITH g AS (
      -- strict >, matching Spark's session_window: per-event windows
      -- [t, t+gap) MERGE when they touch, so an event exactly gap
      -- after the previous one stays in the SAME session (verified
      -- empirically; pinned at the boundary in
      -- tests/test_streaming_session_window.py)
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 1 HOUR
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM g
    )
    SELECT user_id,
           CAST(count(DISTINCT session_no) AS BIGINT) AS n_sessions,
           CAST(max(cnt) AS BIGINT)                   AS max_session_events
    FROM (SELECT user_id, session_no, count(*) AS cnt
          FROM s GROUP BY user_id, session_no)
    GROUP BY user_id
    """,
    tags=("window", "session"),
)
def q62_native_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (gap-based dynamic windows) —
    the engine primitive behind q19's hand-rolled lag sessionization,
    also valid under Structured Streaming with watermarks. One row
    per (user, session) after the session merge, re-aggregated per
    user; the oracle derives identical sessions from the lag+cumsum
    construction."""
    e = t(spark, sf_dir, "events")
    per_session = e.groupBy(
        "user_id", F.session_window("ts", "1 hour")
    ).agg(F.count("*").alias("cnt"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("cnt").alias("max_session_events"),
    )


@register(
    "q63_ranking_family",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(rank()         OVER w AS BIGINT) AS bal_rank,
           CAST(dense_rank()   OVER w AS BIGINT) AS bal_dense_rank,
           CAST(ntile(4)       OVER w AS BIGINT) AS bal_quartile,
           round(percent_rank() OVER w, 6)       AS bal_pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "ranking"),
)
def q63_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family (rank, dense_rank, ntile,
    percent_rank) over one window spec — beyond W2's row_number.
    Deterministic via the custkey tie-break; one exchange+sort."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
    )


@register(
    "q64_date_arithmetic",
    oracle="""
    SELECT date_trunc('month', o_orderdate)                    AS order_month,
           CAST(count(*) AS BIGINT)                            AS n_orders,
           CAST(min(datediff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE))) AS INTEGER)
               AS min_days_since_epoch95,
           CAST(max(CAST(dayofweek(o_orderdate) AS INTEGER)) AS INTEGER)
               AS max_dow,
           CAST(max(CAST(last_day(CAST(o_orderdate AS DATE))
                         AS TIMESTAMP)) AS TIMESTAMP)          AS month_end
    FROM orders
    GROUP BY order_month
    """,
    tags=("date", "agg"),
)
def q64_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time arithmetic surface beyond the reference's to_date
    (F17): date_trunc, datediff vs an anchor, dayofweek, last_day —
    monthly order rollup. Pure builtins; partition-friendly (month
    truncation is the natural partition key for a 100 TB fact table).

    DuckDB's dayofweek is 0=Sunday while Spark's is 1=Sunday, so the
    Spark side subtracts 1 to align. last_day returns DATE in both;
    compared as timestamps for schema parity.
    """
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(
                F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            ).cast("int").alias("min_days_since_epoch95"),
            (F.max(F.dayofweek("o_orderdate")) - F.lit(1)).cast("int").alias("max_dow"),
            F.max(F.last_day(F.col("o_orderdate").cast("date"))).cast("timestamp").alias("month_end"),
        )
    )


@register(
    "q60_time_range_rolling",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(ts AS DATE) AS day,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num,
             count(*)     AS n,
             sum(value)   AS total
      FROM events
      GROUP BY user_id, day, day_num
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           CAST(sum(n) OVER w AS BIGINT)  AS n_7d,
           round(sum(total) OVER w, 4)    AS total_7d
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day_num
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "time"),
)
def q60_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing totals per user via a RANGE frame over event-time
    — the frame q61's ROWS variant cannot express when days are
    MISSING: RANGE 6 PRECEDING covers the last 7 calendar days whether
    or not the user was active on each of them, while ROWS 6 PRECEDING
    would reach back 7 *observations*. Two shuffles: the daily
    pre-aggregation (which also shrinks the window input from events
    to user-days — never run an ordered window over raw events when a
    pre-agg gets the same answer), then the user-partitioned sort for
    the frame."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day_num"),
            "value",
        )
        .groupBy("user_id", "day", "day_num")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.sum("n").over(w).alias("n_7d"),
        F.round(F.sum("total").over(w), 4).alias("total_7d"),
    )
