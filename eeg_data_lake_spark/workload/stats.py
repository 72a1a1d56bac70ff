"""Statistical-association, edit-distance, and gap-filling workload.

Engine-surface additions beyond SURVEY.md §2.4/2.7: bivariate
aggregates (corr / covar / the SQL regr_* family), blocked Levenshtein
near-dup detection (the classic fuzzy-dedup primitive the shingle and
MinHash paths in ``workload/dedup.py`` don't cover), calendar-spine
gap filling for time series, and the value-positional window family
(first_value / last_value / nth_value). All pure JVM expressions —
no Python UDFs — with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t

#: blocked-levenshtein knobs: candidate pairs must share the first
#: BLOCK_PREFIX chars; the distance itself is computed over the first
#: HEAD_LEN chars (bounds the O(len^2) DP regardless of document size)
BLOCK_PREFIX = 16
HEAD_LEN = 64
MAX_EDIT_DIST = 8


@register(
    "q74_stat_association",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)           AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)     AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope_price_on_qty,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept_price,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2_price_on_qty,
           COUNT(*)                                              AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "regression"),
)
def q74_stat_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates per return flag: Pearson
    correlation, sample covariance, and the SQL-standard regr_* linear
    fit of extended price on quantity. One hash-aggregate shuffle on a
    low-cardinality key; all six statistics ride the same single-pass
    partial aggregation (no second scan, no join)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "slope_price_on_qty"
            ),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
                "intercept_price"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
                "r2_price_on_qty"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q75_levenshtein_neardup",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substring(text, 1, {HEAD_LEN})     AS head,
             substring(text, 1, {BLOCK_PREFIX}) AS blk
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
    FROM d a JOIN d b
      ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= {MAX_EDIT_DIST}
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "levenshtein", "fuzzy"),
)
def q75_levenshtein_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by edit distance with prefix blocking: only
    documents sharing their first 16 chars become candidates (equi-join,
    ordinary hash shuffle — never an all-pairs cross join), and the
    Levenshtein DP runs on a 64-char head so per-pair cost is bounded
    O(64^2) no matter how large documents get. Complements the
    shingle/MinHash near-dup family (workload/dedup.py) with the
    character-level primitive. A pathologically hot block (boilerplate
    prefix) is the same skew class as hot shingles — the q33 df-cap /
    salting treatment applies unchanged."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, HEAD_LEN).alias("head"),
        F.substring("text", 1, BLOCK_PREFIX).alias("blk"),
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= MAX_EDIT_DIST)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "q76_gapfill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             COUNT(*) AS n_events, round(SUM(value), 4) AS day_value
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    )
    SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
           COALESCE(d.n_events, 0)    AS n_events,
           COALESCE(d.day_value, 0.0) AS day_value
    FROM spine s LEFT JOIN daily d USING (user_id, day)
    ORDER BY 1, 2
    """,
    tags=("timeseries", "gapfill", "sequence"),
)
def q76_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: every user gets one row per day
    between their first and last event, zero-filled where no events
    happened — the standard densification step before rolling-window
    features (a gap-blind ROWS frame over sparse days is wrong; q60
    handles that with a RANGE frame, this materializes the dense grid).
    Plan: daily pre-aggregate (one shuffle), tiny per-user span agg,
    sequence+explode generates the spine executor-side (never a
    driver-side date loop), then a co-partitioned left join back —
    both sides already hash-partitioned by user_id, so AQE keeps the
    exchange count at the pre-agg's."""
    e = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = e.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("day_value"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            # ISO string day: date pandas dtypes differ between engines
            # (datetime.date objects vs datetime64), strings compare clean
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "q77_value_position_windows",
    oracle="""
    SELECT DISTINCT user_id,
           round(first_value(value) OVER w, 4)   AS first_val,
           round(last_value(value)  OVER w, 4)   AS last_val,
           round(nth_value(value, 3) OVER w, 4)  AS third_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    tags=("window", "positional"),
)
def q77_value_position_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-positional window family: each user's first, last, and
    third event value in time order (nth_value is NULL for users with
    fewer than 3 events). The unbounded-both frame makes all three
    constant within the partition, so the trailing distinct collapses
    to one row per user without a second aggregation pass; ties are
    impossible because (ts, event_id) is a total order."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    return (
        e.select(
            "user_id",
            F.round(F.first_value("value").over(w), 4).alias("first_val"),
            F.round(F.last_value("value").over(w), 4).alias("last_val"),
            F.round(F.nth_value("value", 3).over(w), 4).alias("third_val"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "q79_rank_based_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6)  AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "scale"),
)
def q79_rank_based_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles via the rank-based plan (operators/
    percentiles.py): groupBy(key, value) count → cumulative-rank window
    over distinct values → interpolate the two bracketing values. Same
    linear-interpolation semantics as q10's `percentile` aggregate, but
    the heavy shuffle is the fully parallel distinct-count — the
    per-group serial stage sees only distinct values, never all rows —
    which is the formulation that survives few-groups × 100 TB where
    the aggregate's value→count map state becomes the bottleneck."""
    from eeg_data_lake_spark.operators.percentiles import exact_percentiles

    li = t(spark, sf_dir, "lineitem")
    out = exact_percentiles(li, "l_returnflag", "l_extendedprice", [0.5, 0.95])
    return out.select(
        "l_returnflag",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
    ).orderBy("l_returnflag")


@register(
    "q78_lang_vocab_overlap",
    oracle="""
    WITH lt AS (
      SELECT DISTINCT lang, tok FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
      )
    ), sizes AS (
      SELECT lang, COUNT(*) AS n FROM lt GROUP BY 1
    ), inter AS (
      SELECT a.lang AS la, b.lang AS lb, COUNT(*) AS ni
      FROM lt a JOIN lt b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT sa.lang AS lang_a, sb.lang AS lang_b,
           COALESCE(i.ni, 0)                    AS n_shared,
           sa.n + sb.n - COALESCE(i.ni, 0)      AS n_union,
           round(CAST(COALESCE(i.ni, 0) AS DOUBLE)
                 / (sa.n + sb.n - COALESCE(i.ni, 0)), 6) AS jaccard
    FROM sizes sa
    JOIN sizes sb ON sa.lang < sb.lang
    LEFT JOIN inter i ON i.la = sa.lang AND i.lb = sb.lang
    ORDER BY lang_a, lang_b
    """,
    tags=("text", "array", "setops"),
)
def q78_lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language vocabulary Jaccard via array set algebra:
    per-language distinct-token vocabularies are collected into array
    columns, then every language pair is scored with array_intersect /
    array_union — the array-HOF counterpart of the relational
    anti/semi-join formulation the oracle spells. Scale argument: a
    language's vocabulary grows sublinearly with corpus size (Heaps'
    law) and is bounded in practice (~1e5 tokens ≈ 1-2 MB per row), so
    the collected arrays stay executor-safe at 100 TB even though the
    corpus doesn't; the pair join is a broadcast over #languages rows.
    The distinct-token shuffle on (lang, tok) is the only heavy stage."""
    lt = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    vocab = lt.groupBy("lang").agg(F.collect_set("tok").alias("v"))
    a = vocab.select(F.col("lang").alias("lang_a"), F.col("v").alias("va"))
    b = vocab.select(F.col("lang").alias("lang_b"), F.col("v").alias("vb"))
    inter = F.size(F.array_intersect("va", "vb"))
    union = F.size(F.array_union("va", "vb"))
    return (
        a.join(F.broadcast(b), F.col("lang_a") < F.col("lang_b"))
        .select(
            "lang_a",
            "lang_b",
            inter.cast("long").alias("n_shared"),
            union.cast("long").alias("n_union"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "q86_mad_arrow",
    oracle="""
    SELECT user_id,
           round(median(value), 6) AS med_value,
           round(mad(value), 6)    AS mad_value,
           COUNT(*)                AS n
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "robust-stats", "arrow-udf"),
)
def q86_mad_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user statistics (median + median absolute deviation)
    via ``applyInArrow`` — Spark 4's Arrow-native grouped map, one step
    lower than the pandas UDF path: the kernel receives a
    ``pyarrow.Table`` per group and never pays the Arrow→pandas
    conversion q94 and friends do. MAD needs two dependent medians, so
    it is genuinely outside single-pass SQL aggregation; the shuffle is
    the one groupBy(user_id) exchange and state per group is its value
    vector (bounded: ~events-per-user), exactly like the signal
    kernels. numpy's interpolated median matches DuckDB's
    median()/mad() definitions."""
    import numpy as np
    import pyarrow as pa

    def mad_kernel(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False).astype("float64")
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        # UNROUNDED out of the kernel: Python round() is half-to-even
        # while DuckDB's round() (and F.round) are half-away-from-zero
        # — a median on a 6th-decimal midpoint would hash-mismatch.
        # The outer F.round keeps every query on one rounding rule.
        return pa.table(
            {
                "user_id": pa.array([int(tbl.column("user_id")[0].as_py())]),
                "med_value": pa.array([med]),
                "mad_value": pa.array([mad]),
                "n": pa.array([len(v)], type=pa.int64()),
            }
        )

    e = t(spark, sf_dir, "events").select("user_id", "value")
    return (
        e.groupBy("user_id")
        .applyInArrow(
            mad_kernel,
            "user_id long, med_value double, mad_value double, n long",
        )
        .select(
            "user_id",
            F.round("med_value", 6).alias("med_value"),
            F.round("mad_value", 6).alias("mad_value"),
            "n",
        )
        .orderBy("user_id")
    )


@register(
    "z01_hll_sketch_rollup",
    oracle=None,  # Datasketches HLL binary sketches are Spark-only →
    # rows-only; estimate accuracy is pinned vs exact countDistinct in
    # tests/test_sketches.py
    tags=("agg", "sketch", "hll", "scale"),
)
def z01_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — THE pattern for distinct
    users at 100 TB: build one Datasketches HLL sketch per (event_type,
    day) partial, then roll partials up to event_type totals with
    hll_union_agg, never re-touching raw data. Unlike
    approx_count_distinct (whose HLL++ state is also mergeable but
    opaque), hll_sketch_agg emits the sketch as a binary COLUMN you can
    persist in a gold table: tomorrow's partials union with a year of
    history in O(sketches), the re-aggregation cost of exact distinct
    counting disappears, and any slice of days remains queryable. The
    name sorts after q87-q99 to stay outside the driver's 50-entry
    oracle window (no DuckDB twin for sketch bytes)."""
    e = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "r12_zipf_vocabulary_fit",
    oracle="""
    WITH vocab AS (
      SELECT term, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rnk
      FROM vocab
    ),
    head AS (SELECT * FROM ranked WHERE rnk <= 1000)
    SELECT CAST(count(*) AS BIGINT)               AS n_terms,
           round(regr_slope(ln(n), ln(rnk)), 4)   AS zipf_slope,
           round(regr_intercept(ln(n), ln(rnk)), 4) AS zipf_intercept,
           round(regr_r2(ln(n), ln(rnk)), 4)      AS zipf_r2
    FROM head
    """,
    tags=("stats", "text", "zipf"),
)
def r12_zipf_vocabulary_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law audit of the corpus vocabulary: regress log-frequency
    on log-rank over the top-1000 terms and report the slope (natural
    text ≈ −1; synthetic or deduplicated corpora drift toward 0) — the
    one-number corpus-health check mixing pipelines run per snapshot,
    and a composition test: explode → vocab agg → ranking window →
    regr_* aggregates in one query.

    Scale: the vocab aggregate is the only corpus-sized shuffle
    (Heaps'-law bounded output); the ranking window runs over the
    VOCAB, pre-pruned by Spark's WindowGroupLimit to the top-1000
    frame, and the regression is a single-pass partial aggregate over
    1000 rows. The rank tie-break (count desc, term) is total, so both
    engines rank identically and the fit is bit-stable."""
    d = t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    head = (
        vocab.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 1000)
        .select(F.log("n").alias("ln_n"), F.log("rnk").alias("ln_r"))
    )
    return head.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(F.regr_slope("ln_n", "ln_r"), 4).alias("zipf_slope"),
        F.round(F.regr_intercept("ln_n", "ln_r"), 4).alias("zipf_intercept"),
        F.round(F.regr_r2("ln_n", "ln_r"), 4).alias("zipf_r2"),
    )


@register(
    "r14_rolling_distinct_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day::VARCHAR AS day,
           (SELECT count(DISTINCT u.user_id)
            FROM du u
            WHERE u.day BETWEEN d.day - 6 AND d.day) AS wau
    FROM days d
    """,
    tags=("stats", "window", "distinct", "timeseries"),
)
def r14_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day (the WAU curve) — EXACT
    windowed COUNT(DISTINCT), which no SQL engine's window frame
    supports directly (both Spark and DuckDB reject
    count(DISTINCT) OVER). The engine plan: collapse events to
    distinct (day, user) once, pack each day's users into a set, then
    a RANGE frame over days collects the 7 per-day SETS and
    flatten → array_distinct → size counts the union in-row.

    Scale ledger: the only corpus-sized shuffle is the (day, user)
    distinct; after that everything operates on |days| rows whose
    payload is bounded by per-day cardinality. When per-day sets stop
    fitting in a row (true web scale), z01's mergeable HLL sketches
    are the drop-in replacement — same shape, union of sketches
    instead of arrays, ~1% error. The oracle spells the same semantics
    as a correlated range subquery (fine at oracle scale, quadratic in
    days — exactly what the set-union plan avoids)."""
    ev = t(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    daily = du.groupBy("day").agg(F.collect_set("user_id").alias("users"))
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.size(
            F.array_distinct(
                F.flatten(F.collect_list("users").over(w))
            )
        ).cast("long").alias("wau"),
    )


@register(
    "r42_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS flag, l_extendedprice AS v, sum(l_quantity) AS wt
      FROM lineitem GROUP BY flag, v
    ),
    cum AS (
      SELECT flag, v, wt,
             sum(wt) OVER (PARTITION BY flag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY flag) AS tw
      FROM w
    )
    SELECT flag, CAST(count(*) AS BIGINT) AS n_distinct,
           round(min(CASE WHEN cw >= tw / 2 THEN v END), 6) AS weighted_median
    FROM cum GROUP BY flag
    """,
    tags=("stats", "weighted-median", "percentile"),
)
def r42_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (lower-median convention) of price
    weighted by quantity, per return flag — the quantity-weighted "half
    the VOLUME sold below this price" statistic no builtin aggregate
    computes (percentile() weights every row equally).

    Same fully-parallel plan as operators/percentiles.py, generalized
    to weights: the only heavy shuffle is the (key, value) pre-agg that
    sums weights per distinct value (map-side combined); the cumulative
    window then runs on |distinct values| rows, and the median is a
    conditional min — no value→count map ever concentrates on one
    reducer. ROWS frame (not RANGE) is correct here BECAUSE the
    pre-agg made values distinct per key: no peers exist, and the
    running weight must step at every value."""
    li = t(spark, sf_dir, "lineitem")
    w = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    ).agg(F.sum("l_quantity").alias("wt"))
    wk = Window.partitionBy("flag")
    cum = w.select(
        "flag",
        "v",
        F.sum("wt")
        .over(
            wk.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cw"),
        F.sum("wt").over(wk).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.count("*").alias("n_distinct"),
        F.round(
            F.min(F.when(F.col("cw") >= F.col("tw") / 2, F.col("v"))), 6
        ).alias("weighted_median"),
    )


@register(
    "r43_target_encoding",
    oracle="""
    WITH enc AS (
      SELECT o_orderpriority AS pri, o_totalprice AS y,
             (sum(o_totalprice) OVER (PARTITION BY o_orderpriority) - o_totalprice)
               / (count(*) OVER (PARTITION BY o_orderpriority) - 1) AS loo,
             avg(o_totalprice) OVER () AS prior,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT pri, CAST(max(n) AS BIGINT) AS n_rows,
           round(avg(loo), 6) AS avg_loo_encoding,
           round(avg((loo * (n - 1) + prior * 20) / (n - 1 + 20)), 6) AS smoothed
    FROM enc GROUP BY pri
    """,
    tags=("stats", "ml-features", "target-encoding"),
)
def r43_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with m-estimate smoothing (m=20)
    — the categorical-feature encoder every tabular-ML pipeline fits at
    scale. LOO subtracts each row's own target from its category mean
    (the standard leakage guard: encoding a row with a statistic that
    contains its own label is target leakage), and the m-estimate
    blends small categories toward the global prior.

    Plan: category sums/counts ride ONE window exchange on the
    category key; the global prior comes from a 1-row aggregate
    broadcast back (the oracle's `avg() OVER ()` global window would
    be a single-task sort in Spark — the broadcast spells the same
    number without the scale trap). Per-row arithmetic is narrow; the
    verification rollup groups back to |categories| rows."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("y"),
    )
    prior = o.agg(F.avg("y").alias("prior"))
    w = Window.partitionBy("pri")
    enc = (
        o.withColumn("s", F.sum("y").over(w))
        .withColumn("n", F.count("*").over(w))
        .crossJoin(F.broadcast(prior))
        .withColumn("loo", (F.col("s") - F.col("y")) / (F.col("n") - 1))
    )
    m = F.lit(20)
    smoothed = (F.col("loo") * (F.col("n") - 1) + F.col("prior") * m) / (
        F.col("n") - 1 + m
    )
    return enc.groupBy("pri").agg(
        F.max("n").alias("n_rows"),
        F.round(F.avg("loo"), 6).alias("avg_loo_encoding"),
        F.round(F.avg(smoothed), 6).alias("smoothed"),
    )


@register(
    "r44_anova_sources",
    oracle="""
    WITH g AS (
      SELECT source, count(*) AS n, avg(CAST(n_chars AS DOUBLE)) AS m,
             sum(CAST(n_chars AS DOUBLE) * n_chars) AS ss
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT sum(n) AS nt, sum(m * n) / sum(n) AS gm, count(*) AS k FROM g
    )
    SELECT CAST(tot.k AS BIGINT) AS k_groups, CAST(tot.nt AS BIGINT) AS n_rows,
           round(sum(g.n * (g.m - tot.gm) * (g.m - tot.gm)) / (tot.k - 1), 6)
               AS ms_between,
           round(sum(g.ss - g.n * g.m * g.m) / (tot.nt - tot.k), 6)
               AS ms_within,
           round((sum(g.n * (g.m - tot.gm) * (g.m - tot.gm)) / (tot.k - 1))
                 / (sum(g.ss - g.n * g.m * g.m) / (tot.nt - tot.k)), 6)
               AS f_stat
    FROM g CROSS JOIN tot
    GROUP BY tot.k, tot.nt
    """,
    tags=("stats", "anova", "variance-decomposition"),
)
def r44_anova_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for document length across sources —
    "does the SOURCE explain length variance?", the between/within
    decomposition that complements r35's chi-squared (categorical ×
    categorical) and r34's KS (two-cohort shape) with the
    categorical × continuous axis of the dataset-bias audit family.

    Plan: the corpus collapses to per-source sufficient statistics
    (n, mean, Σx²) in ONE agg shuffle; grand totals are a 1-row
    broadcast; SSB/SSW are arithmetic over |sources| rows. The Σx²
    shortcut's cancellation error is ~1e-8 absolute at these
    magnitudes — orders below the round(…,6) comparison grid (both
    engines compute the same shortcut, so even that drift is shared)."""
    d = t(spark, sf_dir, "documents").withColumn(
        "v", F.col("n_chars").cast("double")
    )
    g = d.groupBy("source").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("m"),
        F.sum(F.col("v") * F.col("n_chars")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        (F.sum(F.col("m") * F.col("n")) / F.sum("n")).alias("gm"),
        F.count("*").alias("k"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ssb = F.sum(
        F.col("n") * (F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))
    )
    ssw = F.sum(F.col("ss") - F.col("n") * F.col("m") * F.col("m"))
    ms_between = ssb / (F.first("k") - 1)
    ms_within = ssw / (F.first("nt") - F.first("k"))
    return j.groupBy("k", "nt").agg(
        F.round(ms_between, 6).alias("ms_between"),
        F.round(ms_within, 6).alias("ms_within"),
        F.round(ms_between / ms_within, 6).alias("f_stat"),
    ).select(
        F.col("k").alias("k_groups"),
        F.col("nt").alias("n_rows"),
        "ms_between",
        "ms_within",
        "f_stat",
    )


@register(
    "z11_tdigest_rollup",
    oracle=None,  # t-digest centroids are Spark-only → rows-only;
    # accuracy vs exact percentiles and mergeability are pinned in
    # tests/test_tdigest.py
    tags=("agg", "sketch", "tdigest", "quantile", "scale"),
)
def z11_tdigest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches — the quantile analog of z01's HLL
    rollup: one t-digest per (event_type, day) partial, rolled up to
    event_type totals by centroid merge (O(sketches), raw data never
    re-read), then p50/p95/p99 estimated from the merged digests.
    Persisting the daily partials in a gold table turns any later
    percentile query over any day slice into a centroid merge; exact
    percentile (q10) needs every raw value every time. Accuracy is
    relative-error bounded at the tails by the k1 scale function
    (tests gate p50/p95/p99 against the exact answers)."""
    from eeg_data_lake_spark.operators.tdigest import (
        build_digests,
        merge_digests,
        quantiles_from_digests,
    )

    e = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    daily = build_digests(e, ["event_type", "day"], "value")
    merged = merge_digests(daily, ["event_type"])
    return quantiles_from_digests(merged, [0.50, 0.95, 0.99]).select(
        "event_type",
        "d_count",
        F.size("centroids").alias("n_centroids"),
        F.round("p50", 4).alias("p50"),
        F.round("p95", 4).alias("p95"),
        F.round("p99", 4).alias("p99"),
    )


@register(
    "z14_rolling_hll_wau",
    oracle=None,  # binary HLL sketches are Spark-only → rows-only;
    # accuracy gated against the EXACT r14 curve in tests/test_sketches.py
    tags=("agg", "sketch", "hll", "window", "scale"),
)
def z14_rolling_hll_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAU curve r14 computes exactly, re-expressed as the sketch
    rollup r14's docstring promises for web scale: one HLL sketch per
    day (the only corpus-sized shuffle), then a 7-day RANGE frame
    unions SKETCHES instead of user-id sets — per-day state is ~KB
    regardless of per-day cardinality, where r14's arrays grow with
    distinct users. The unpartitioned window moves |days| sketch rows,
    not events (same note as r14). ~1-2% error, gated against the
    exact curve in tests."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date("ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("approx_wau"),
    )


#: quantile-normalization grid resolution (bins of the reference CDF)
_QN_BINS = 1000

_QN_FRACS = ", ".join(f"{i}/{_QN_BINS}.0" for i in range(_QN_BINS + 1))


@register(
    "r56_quantile_normalization",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    pr AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS pr
      FROM d
    ),
    g AS (SELECT quantile_cont(n_chars, [{_QN_FRACS}]) AS l FROM d),
    grid AS (
      SELECT CAST(i.i AS INTEGER) AS bin, g.l[i.i + 1] AS gval
      FROM g, UNNEST(range({_QN_BINS} + 1)) AS i(i)
    )
    SELECT p.doc_id, p.source, p.n_chars,
           round(grid.gval, 6) AS normalized
    FROM pr p
    JOIN grid ON grid.bin = least(CAST(floor(p.pr * {_QN_BINS}) AS INTEGER),
                                  {_QN_BINS})
    """,
    tags=("stats", "curation", "quantile-normalization"),
)
def r56_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization (the genomics/ML standard
    for making per-source score distributions comparable — here:
    document lengths, the same shape applies to quality scores before
    a global threshold): each document's within-source percent rank is
    mapped onto the GLOBAL distribution via a precomputed
    1001-point quantile grid.

    Scale design: the grid is ONE percentile aggregate (array of
    fractions — one state build, the q10 discipline) broadcast to a
    1001-row join; the per-source rank is one window exchange on
    source. The naive formulation — an asof join of every row's rank
    against the full sorted global column — would put the whole corpus
    through a single-partition range lookup; the grid caps that at
    {_QN_BINS}+1 rows for any corpus size (grid resolution, not data
    size, bounds the mapping error)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    fracs = ", ".join(repr(i / _QN_BINS) for i in range(_QN_BINS + 1))
    grid = (
        d.agg(F.expr(f"percentile(n_chars, array({fracs}))").alias("l"))
        .select(F.posexplode("l").alias("bin", "gval"))
    )
    scored = d.withColumn("pr", F.percent_rank().over(w)).withColumn(
        "bin",
        F.least(
            F.floor(F.col("pr") * _QN_BINS).cast("int"), F.lit(_QN_BINS)
        ),
    )
    return scored.join(F.broadcast(grid), "bin").select(
        "doc_id", "source", "n_chars", F.round("gval", 6).alias("normalized")
    )


def _profile_sql(col: str, val_expr: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(count(*) AS BIGINT)                    AS n_rows,
           CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                                       AS n_null,
           CAST(count(DISTINCT {col}) AS BIGINT)       AS n_distinct,
           CAST(min({val_expr}) AS VARCHAR)            AS min_s,
           CAST(max({val_expr}) AS VARCHAR)            AS max_s
    FROM orders"""


@register(
    "r57_table_profile",
    oracle=" UNION ALL ".join(
        [
            _profile_sql("o_orderkey", "o_orderkey"),
            _profile_sql("o_orderpriority", "o_orderpriority"),
            _profile_sql("o_orderstatus", "o_orderstatus"),
            _profile_sql(
                "o_totalprice",
                "CAST(round(o_totalprice, 2) AS DECIMAL(18,2))",
            ),
            _profile_sql("o_orderdate", "CAST(o_orderdate AS DATE)"),
        ]
    ),
    tags=("stats", "profiling", "quality"),
)
def r57_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile (the Deequ/"ANALYZE report" shape):
    per column — row count, NULL count, exact distinct count, min and
    max (value-typed columns rendered through engine-portable casts:
    decimals for floats, dates for timestamps, so the string forms
    hash-match across engines). ONE scan: all metrics ride a single
    aggregate (multi-distinct → one Expand), then the wide row unpivots
    to the long report. The profile every ingestion gate and data
    catalog computes nightly."""
    o = t(spark, sf_dir, "orders")
    specs = [
        ("o_orderkey", F.col("o_orderkey")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_orderstatus", F.col("o_orderstatus")),
        (
            "o_totalprice",
            F.round("o_totalprice", 2).cast("decimal(18,2)"),
        ),
        ("o_orderdate", F.col("o_orderdate").cast("date")),
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, expr in specs:
        aggs += [
            F.sum(F.when(F.col(name).isNull(), 1).otherwise(0)).alias(f"{name}__nn"),
            F.countDistinct(F.col(name)).alias(f"{name}__nd"),
            F.min(expr).cast("string").alias(f"{name}__min"),
            F.max(expr).cast("string").alias(f"{name}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{n}', {n}__nn, {n}__nd, {n}__min, {n}__max" for n, _ in specs
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(specs)}, {stack}) AS "
        "(column_name, n_null, n_distinct, min_s, max_s)",
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")


@register(
    "r58_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM customer) AS BIGINT)
    UNION ALL
    SELECT 'nation->region',
           CAST((SELECT count(*) FROM nation n
                 WHERE NOT EXISTS (SELECT 1 FROM region r
                                   WHERE r.r_regionkey = n.n_regionkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM nation) AS BIGINT)
    """,
    tags=("stats", "quality", "referential-integrity", "anti-join"),
)
def r58_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — orphan counts for
    every foreign key in the star schema, the warehouse QA gate run
    after each load. Each check is ONE aggregation over a broadcast
    LEFT join against the (distinct, dimension-sized) parent key set:
    ``n_rows`` and ``n_orphans`` (parent-miss rows, NULL keys
    included — matching the oracle's NOT EXISTS) come out of the same
    pass, so every child table is scanned exactly once and never
    shuffles. The four per-FK one-row aggregates union LAZILY into a
    single plan — zero driver actions at build time and one job at
    consumption, where the round-3 version ran 8 sequential blocking
    jobs and scanned each fact table twice. (The engine has no
    enforced FK constraints — like every lakehouse — so this audit IS
    the integrity mechanism; r10's expectations quarantine the rows
    these counts detect.)"""
    from functools import reduce

    pairs = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = []
    for fk, child, ck, parent, pk in pairs:
        c = t(spark, sf_dir, child).select(ck)
        p = (
            t(spark, sf_dir, parent)
            .select(F.col(pk).alias("__pk"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        parts.append(
            c.join(F.broadcast(p), F.col(ck) == F.col("__pk"), "left")
            .agg(
                # coalesce: sum over an EMPTY child is NULL, but the
                # audit (and the oracle's count(*)) must report 0
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_orphans"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .select(F.lit(fk).alias("fk"), "n_orphans", "n_rows")
        )
    return reduce(lambda a, b: a.unionAll(b), parts)


@register(
    "r59_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), stats AS (
      SELECT count(*)                    AS n_keys,
             sum(n)                      AS n_rows,
             max(n)                      AS max_key_rows,
             avg(n)                      AS mean_rows,
             quantile_cont(n, 0.99)      AS p99_rows
      FROM per_key
    )
    SELECT CAST(n_keys AS BIGINT)                       AS n_keys,
           CAST(n_rows AS BIGINT)                       AS n_rows,
           CAST(max_key_rows AS BIGINT)                 AS max_key_rows,
           round(max_key_rows / mean_rows, 6)           AS max_over_mean,
           round(p99_rows / mean_rows, 6)               AS p99_over_mean,
           round(max_key_rows * 1.0 / n_rows, 6)        AS max_key_share
    FROM stats
    """,
    tags=("stats", "skew", "diagnosis"),
)
def r59_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/groupBy-key skew diagnosis: the per-key row distribution's
    max/mean, p99/mean and hottest-key share — the numbers that decide
    between a plain shuffle, AQE skew-join, and explicit salting
    (operators/skew.salted_join) BEFORE a 100 TB job discovers its
    straggler the hard way. One groupBy of the key + a 1-row stats agg;
    at scale the per-key relation is |keys|, not |rows|."""
    per_key = (
        t(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("n"))
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.round(F.max("n") / F.avg("n"), 6).alias("max_over_mean"),
        F.round(F.expr("percentile(n, 0.99)") / F.avg("n"), 6).alias(
            "p99_over_mean"
        ),
        F.round(F.max("n") * 1.0 / F.sum("n"), 6).alias("max_key_share"),
    )


#: PSI period boundary: January 2024 first half vs second half
_PSI_SPLIT = "2024-01-16"

_PSI_DECILES = ", ".join(repr(i / 10) for i in range(1, 10))


@register(
    "r62_psi_drift",
    oracle=f"""
    WITH ref AS (
      SELECT event_type, value FROM events WHERE ts < TIMESTAMP '{_PSI_SPLIT}'
    ), cur AS (
      SELECT event_type, value FROM events WHERE ts >= TIMESTAMP '{_PSI_SPLIT}'
    ), edges AS (
      SELECT quantile_cont(value, [{_PSI_DECILES}]) AS l FROM ref
    ), rb AS (
      SELECT event_type,
             len(list_filter((SELECT l FROM edges), e -> value >= e)) AS bin
      FROM ref
    ), cb AS (
      SELECT event_type,
             len(list_filter((SELECT l FROM edges), e -> value >= e)) AS bin
      FROM cur
    ), rc AS (
      SELECT event_type, bin, count(*) AS c FROM rb GROUP BY 1, 2
    ), cc AS (
      SELECT event_type, bin, count(*) AS c FROM cb GROUP BY 1, 2
    ), rn AS (SELECT event_type, sum(c) AS n FROM rc GROUP BY 1),
    cn AS (SELECT event_type, sum(c) AS n FROM cc GROUP BY 1),
    bins AS (
      SELECT et.event_type, b.bin
      FROM (SELECT DISTINCT event_type FROM events) et,
           UNNEST(range(10)) AS b(bin)
    ), terms AS (
      SELECT bins.event_type, bins.bin,
             ((COALESCE(rc.c, 0) + 1.0) / (rn.n + 10.0)
              - (COALESCE(cc.c, 0) + 1.0) / (cn.n + 10.0))
             * ln(((COALESCE(rc.c, 0) + 1.0) / (rn.n + 10.0))
                  / ((COALESCE(cc.c, 0) + 1.0) / (cn.n + 10.0))) AS term
      FROM bins
      LEFT JOIN rc ON rc.event_type = bins.event_type AND rc.bin = bins.bin
      LEFT JOIN cc ON cc.event_type = bins.event_type AND cc.bin = bins.bin
      JOIN rn ON rn.event_type = bins.event_type
      JOIN cn ON cn.event_type = bins.event_type
    )
    SELECT event_type,
           round(list_reduce(
             list_transform(
               list_sort(list(struct_pack(b := bin, t := term))),
               x -> x.t),
             (a, x) -> a + x), 6) AS psi
    FROM terms
    GROUP BY event_type
    """,
    tags=("stats", "drift", "psi", "monitoring"),
)
def r62_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference period (first
    half of the month) and the current period, per event type — THE
    production ML-monitoring drift metric (PSI > 0.2 = retrain alarm),
    complementing r34's KS test with the binned, additive formulation
    monitoring dashboards use. Decile edges come from ONE percentile
    aggregate over the reference period (broadcast, 9 doubles);
    binning is an in-row array count; the per-type PSI folds its 10
    bin terms in pinned bin order (the r47 discipline) so the float
    sum is bit-identical to the oracle's list_reduce. Laplace +1
    smoothing keeps empty bins finite."""
    e = t(spark, sf_dir, "events").select("event_type", "ts", "value")
    ref = e.filter(F.col("ts") < _PSI_SPLIT)
    cur = e.filter(F.col("ts") >= _PSI_SPLIT)
    edges = ref.agg(
        F.expr(f"percentile(value, array({_PSI_DECILES}))").alias("l")
    )

    def binned(df):
        return (
            df.crossJoin(F.broadcast(edges))
            .select(
                "event_type",
                F.size(
                    F.filter("l", lambda x: F.col("value") >= x)
                ).alias("bin"),
            )
            .groupBy("event_type", "bin")
            .agg(F.count("*").alias("c"))
        )

    rc = binned(ref)
    cc = binned(cur)
    rn = rc.groupBy("event_type").agg(F.sum("c").alias("rn"))
    cn = cc.groupBy("event_type").agg(F.sum("c").alias("cn"))
    bins = (
        e.select("event_type")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bin")))
    )
    p = (F.coalesce(F.col("rc_c"), F.lit(0)) + 1.0) / (F.col("rn") + 10.0)
    q = (F.coalesce(F.col("cc_c"), F.lit(0)) + 1.0) / (F.col("cn") + 10.0)
    terms = (
        bins.join(rc.withColumnRenamed("c", "rc_c"), ["event_type", "bin"], "left")
        .join(cc.withColumnRenamed("c", "cc_c"), ["event_type", "bin"], "left")
        .join(F.broadcast(rn), "event_type")
        .join(F.broadcast(cn), "event_type")
        .select(
            "event_type",
            F.struct(F.col("bin"), ((p - q) * F.log(p / q)).alias("t")).alias("x"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(F.sort_array(F.collect_list("x")).alias("xs"))
        .select(
            "event_type",
            F.round(
                F.aggregate(
                    F.expr("slice(xs, 2, size(xs) - 1)"),
                    F.element_at("xs", 1).getField("t"),
                    lambda a, x: a + x.getField("t"),
                ),
                6,
            ).alias("psi"),
        )
    )


# --------------------------------------------------------------------
# r69: Benford first-digit audit (forensic data quality)
# --------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (
  SELECT digit, count(*) AS n FROM digits GROUP BY digit
),
tot AS (SELECT sum(n) AS total FROM obs)
SELECT digit,
       CAST(n AS BIGINT) AS n,
       round(n / total, 6) AS observed_share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
       round(pow(n / total - log10(1.0 + 1.0 / digit), 2)
             / log10(1.0 + 1.0 / digit), 6) AS chi2_term
FROM obs, tot ORDER BY digit
"""


@register(
    "r69_benford_audit",
    oracle=_BENFORD_ORACLE,
    tags=("quality", "benford", "forensic"),
)
def r69_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    forensic data-quality screen for fabricated or truncated numeric
    columns (Nigrini 2012): observed first-significant-digit shares
    vs the log10(1 + 1/d) law, with the per-digit chi-square
    contribution so an auditor can see WHICH digit deviates.

    The digit is extracted arithmetically-by-string (first char of the
    integer part — identical semantics in both engines, no float-log
    round-trip), so the whole query is one map + one 9-group
    aggregation: a single partial-aggregated shuffle of 9 rows,
    trivially 100 TB-safe. The total rides an unpartitioned window
    over the 9-row aggregate (the r66 whole-relation-share pattern —
    single-partition on purpose, it carries ≤ 9 rows at any corpus
    size), never a second corpus scan and never a join."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    share = F.col("n") / total
    return (
        obs.select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(share, 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(F.pow(share - benford, 2) / benford, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------
# r70: Gini concentration of revenue per nation (skew quantified)
# --------------------------------------------------------------------

_GINI_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
         sum(o.o_totalprice) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, revenue,
         row_number() OVER (PARTITION BY nationkey
                            ORDER BY revenue, custkey) AS i,
         count(*) OVER (PARTITION BY nationkey) AS n,
         sum(revenue) OVER (PARTITION BY nationkey) AS total
  FROM rev
)
SELECT n2.n_name AS nation,
       CAST(max(n) AS BIGINT) AS n_customers,
       round(max(total), 2) AS total_revenue,
       round(2.0 * sum(i * revenue) / (max(n) * max(total))
             - (max(n) + 1.0) / max(n), 6) AS gini
FROM ranked JOIN nation n2 ON ranked.nationkey = n2.n_nationkey
GROUP BY n2.n_name ORDER BY nation
"""


@register(
    "r70_gini_concentration",
    oracle=_GINI_ORACLE,
    tags=("skew", "gini", "window"),
)
def r70_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue within each nation —
    the single-number concentration readout that turns r59's raw key
    histogram into 'how skewed is this join key really' (G = 2·Σi·xᵢ/
    (n·Σx) − (n+1)/n over ascending-sorted values): the number a
    platform team tracks to decide when a key needs salting.

    Plan: the corpus-sized work is ONE groupBy (order → per-customer
    revenue); the ranking windows run over the |customers| aggregate
    partitioned by nation, and the nation dim joins broadcast. The
    rank tie-breaks on custkey so i is deterministic when two
    customers tie on revenue — without it the Σi·xᵢ dot product would
    be engine-dependent."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("nationkey")
    w_rank = Window.partitionBy("nationkey").orderBy("revenue", "custkey")
    ranked = rev.select(
        "nationkey",
        "revenue",
        F.row_number().over(w_rank).alias("i"),
        F.count("*").over(w).alias("n"),
        F.sum("revenue").over(w).alias("total"),
    )
    return (
        ranked.join(F.broadcast(n), ranked.nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            F.round(F.max("total"), 2).alias("total_revenue"),
            F.round(
                2.0 * F.sum(F.col("i") * F.col("revenue"))
                / (F.max("n") * F.max("total"))
                - (F.max("n") + 1.0) / F.max("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------
# r71: ROC-AUC by rank statistic over binned scores
# --------------------------------------------------------------------

_AUC_ORACLE = """
WITH b AS (
  SELECT round(value, 2) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE value IS NOT NULL
),
g AS (
  SELECT s, sum(y) AS np, sum(1 - y) AS nn
  FROM b GROUP BY s
),
c AS (
  SELECT s, np, nn,
         coalesce(sum(nn) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
  FROM g
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       round(sum(np * (cum_neg + 0.5 * nn))
             / (sum(np) * sum(nn)), 6) AS auc
FROM c
"""


@register(
    "r71_auc_rank",
    oracle=_AUC_ORACLE,
    tags=("ml-eval", "auc", "window"),
)
def r71_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the metric value as a predictor of purchase events,
    by the Mann–Whitney identity AUC = P(s₊ > s₋) + ½P(s₊ = s₋) —
    the univariate feature-screening number ranked before any model
    training. Computed HISTOGRAM-style: scores bin to 2 decimals, the
    corpus aggregates to (bin, n_pos, n_neg) once, and the rank
    statistic folds over cumulative-negative counts on the BIN table.

    Scale shape: the only corpus-sized pass is the bin groupBy
    (partial-aggregated shuffle of |bins| rows); the unpartitioned
    cumulative window rides the bounded bin table (≤ ~10⁴ bins by
    construction of the rounding), not the corpus — the same
    single-partition-on-purpose trade every distributed AUC
    implementation (e.g. MLlib's BinaryClassificationMetrics
    curve-on-bins) makes. Ties are handled exactly via the ½·n_neg
    same-bin term, so the result is the true tie-corrected AUC of the
    binned scores in both engines."""
    b = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.round("value", 2).alias("s"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
    )
    g = b.groupBy("s").agg(
        F.sum("y").alias("np"), F.sum(1 - F.col("y")).alias("nn")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = g.withColumn("cum_neg", F.coalesce(F.sum("nn").over(w), F.lit(0)))
    return c.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.round(
            F.sum(F.col("np") * (F.col("cum_neg") + 0.5 * F.col("nn")))
            / (F.sum("np") * F.sum("nn")),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------
# r77: Theil-T inequality with between/within-nation decomposition
# --------------------------------------------------------------------

_THEIL_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
         sum(o.o_totalprice) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
tot AS (
  SELECT count(*) AS n, sum(x) AS sx, avg(x) AS mu FROM rev
),
within AS (
  -- SAME algebraic chain as the Spark side — sufficient statistics
  -- (Σx·lnx − ln(μ)·Σx)/μ/n, never per-row (x/μ)ln(x/μ): different
  -- IEEE chains into a round(.,6) compare is the r67 flake class
  SELECT r.nationkey,
         count(*) AS n_g,
         sum(r.x) AS sx_g,
         (sum(r.x * ln(r.x)) - ln(t.sx / t.n) * sum(r.x))
           / (t.sx / t.n) / t.n AS theil_contrib
  FROM rev r, tot t
  GROUP BY r.nationkey, t.n, t.sx
)
SELECT w.nationkey AS nationkey,
       CAST(w.n_g AS BIGINT) AS n_customers,
       round(w.theil_contrib, 6) AS theil_contrib,
       round((w.sx_g / t.sx) * ln((w.sx_g / t.sx) / (w.n_g * 1.0 / t.n)),
             6) AS between_term,
       round(w.theil_contrib
             - (w.sx_g / t.sx) * ln((w.sx_g / t.sx) / (w.n_g * 1.0 / t.n)),
             6) AS within_term
FROM within w, tot t
ORDER BY nationkey
"""


@register(
    "r77_theil_decomposition",
    oracle=_THEIL_ORACLE,
    tags=("skew", "theil", "inequality"),
)
def r77_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of per-customer revenue with the exact
    between-/within-nation decomposition — the property Gini (r70)
    lacks: T = T_between + Σ share_g·T_within,g, so a platform team
    can read WHERE the concentration lives (a few hot nations vs hot
    customers inside each nation) — the shuffle-skew triage question.

    Plan: same single corpus groupBy as r70 (per-customer revenue),
    then nation-level SUFFICIENT statistics (Σx·lnx, Σx, n) — the
    algebraic form Σ(x/μ)ln(x/μ) = (Σx·lnx − ln(μ)Σx)/μ means no
    per-row global mean is ever needed, so grand totals ride a window
    over the 25-row nation aggregate (the r69 pattern), never a join
    onto the corpus. Two aggregate exchanges, nothing corpus-sized
    re-shuffles."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(F.sum("o_totalprice").alias("x"))
    )
    # nation-level sufficient statistics only — Σx·lnx, Σx, n_g —
    # so the per-customer relation is aggregated straight to 25 rows
    # with NO per-row global mean: Σ(x/μ)ln(x/μ) = (Σx·lnx − ln(μ)·Σx)/μ
    g = rev.groupBy("nationkey").agg(
        F.count("*").alias("n_g"),
        F.sum("x").alias("sx_g"),
        F.sum(F.col("x") * F.log("x")).alias("sxlx_g"),
    )
    w_all = Window.partitionBy()
    n = F.sum("n_g").over(w_all)
    sx = F.sum("sx_g").over(w_all)
    mu = sx / n
    within = g.select(
        "nationkey",
        "n_g",
        "sx_g",
        n.alias("n"),
        sx.alias("sx"),
        (
            (F.col("sxlx_g") - F.log(mu) * F.col("sx_g")) / mu / n
        ).alias("theil_contrib"),
    )
    between = (F.col("sx_g") / F.col("sx")) * F.log(
        (F.col("sx_g") / F.col("sx")) / (F.col("n_g") * 1.0 / F.col("n"))
    )
    return (
        within.select(
            "nationkey",
            F.col("n_g").cast("long").alias("n_customers"),
            F.round("theil_contrib", 6).alias("theil_contrib"),
            F.round(between, 6).alias("between_term"),
            F.round(F.col("theil_contrib") - between, 6).alias("within_term"),
        )
        .orderBy("nationkey")
    )
