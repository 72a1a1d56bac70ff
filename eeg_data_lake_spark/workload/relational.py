"""Relational core: scans, filters, joins, aggregations, set ops, sorts.

Covers SURVEY.md §2.1 S4/S12/S19, §2.2 P1-P11, §2.3 J1+engine-completeness
joins, §2.4 A1-A3/A8/A10-A11, §2.6 O1-O2, §2.7 F9/F10/F15/F16/F19/F20.

Scale notes are per-query docstrings; the common thread:
- filters sit directly on the scan so Catalyst pushes them to parquet;
- small dimensions (region/nation/part at any SF, customer at small SF)
  broadcast — verified in tests via explain();
- aggregates are partial+final hash aggs, no row explosion before the
  shuffle.

Floating-point outputs are wrapped in round(…, N) on BOTH sides so the
driver's value hash is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(sum(l_quantity), 4) / count(*)                             AS avg_qty,
           round(sum(l_extendedprice), 4) / count(*)                        AS avg_price,
           round(sum(l_discount), 4) / count(*)                             AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (A1): scan-filter-agg, the flagship.

    Plan shape: parquet scan with pushed l_shipdate filter → partial hash
    agg (map-side, 6 aggregates share one pass) → 4-row exchange → final
    agg. At 100 TB this is scan-bound; no operator materializes more than
    (#groups × #aggs) state per task.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            # canonical avg: round(sum,4)/count — both engines divide the
            # same double, so the result is bit-identical (round(avg(x),N)
            # can straddle a decimal boundary when count = 2^a*5^b)
            (F.round(F.sum("l_quantity"), 4) / F.count("*")).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 4) / F.count("*")).alias("avg_price"),
            (F.round(F.sum("l_discount"), 4) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_top_revenue_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "topk"),
)
def q02_top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way equi-join + agg + deterministic top-k (J/O2).

    lineitem⋈orders shuffles on orderkey; the customer side is small
    relative to facts at every SF, so Catalyst broadcast it (verified in
    tests). Top-k plans as TakeOrderedAndProject — no global sort.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # pre-aggregate revenue to one row per order BEFORE joining: the
    # orderkey join then moves |orders| rows instead of |lineitem|,
    # and n_orders becomes a plain count — no countDistinct expand.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q03_nation_customer_balance",
    oracle="""
    SELECT n.n_name,
           count(c.c_custkey)                       AS n_customers,
           round(coalesce(sum(c.c_acctbal), 0), 2)  AS total_acctbal
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join",),
)
def q03_nation_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched dimension rows (J1 shape)."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias(
                "total_acctbal"
            ),
        )
    )


@register(
    "q04_customers_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "semi"),
)
def q04_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no row multiplication, build side only
    needs the key column — the scan prunes to o_custkey alone."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q05_customers_without_orders",
    oracle="""
    SELECT n.n_name, count(*) AS n_idle
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY n.n_name
    """,
    tags=("join", "anti"),
)
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) + broadcast dimension join."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_idle"))
    )


@register(
    "q06_small_part_quantity",
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_quantity), 2) AS sum_qty,
           count(*)                    AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
    tags=("join", "broadcast"),
)
def q06_small_part_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈filtered-dimension with an explicit broadcast hint: the
    p_size predicate prunes the build side before it ships, so the fact
    table never shuffles — the shape that survives a 100× scale-up."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q07_priority_orders_in_range",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderstatus <> 'F'
    GROUP BY o_orderpriority
    """,
    tags=("filter",),
)
def q07_priority_orders_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound range + inequality predicate (P8/P10), all pushed to the
    parquet scan (PushedFilters verified in tests)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderstatus") != "F")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q08_region_whitelist",
    oracle="""
    SELECT r.r_name, n.n_name,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 4) / count(*) AS avg_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY r.r_name, n.n_name
    """,
    tags=("filter", "join"),
)
def q08_region_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list whitelist (P5/F20, the channel-whitelist shape of
    /root/reference/delta_bronze.py:76) through a snowflake join."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            (F.round(F.sum("c_acctbal"), 4) / F.count("*")).alias("avg_acctbal"),
        )
    )


@register(
    "q09_conditional_aggregates",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_big,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice END), 4)
             / count(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice END) AS avg_urgent_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q09_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (A3/A10/F10/F19): SUM(CASE WHEN) and a
    null-propagating conditional AVG."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_big"),
        (
            F.round(
                F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))), 4
            )
            / F.count(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice")))
        ).alias("avg_urgent_price"),
    )


@register(
    "q10_price_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q10_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (A2's exact-parity variant; the
    medallion gold table uses percentile_approx — same API family, the
    approximate form can't hash-match a different engine's sketch, so
    the oracle-checked query computes `percentile`-identical linear
    interpolation).

    Routed through the rank-based exact plan
    (operators/percentiles.exact_percentiles, builtin parity pinned in
    tests/test_percentiles.py) rather than Spark's `percentile`
    aggregate: with only 3 l_returnflag groups the aggregate's
    value→count map state lands on THREE reducers that each buffer a
    corpus-sized map — a genuine narrow stage at 100 TB. Here the
    heavy shuffle is groupBy(flag, price).count() — parallel over
    DISTINCT VALUES with map-side combine — and min/max ride the same
    shuffle via with_min_max (min over distinct values == min over
    rows), so the whole query is one scan, one wide shuffle, and a
    window over |distinct| rows."""
    from eeg_data_lake_spark.operators.percentiles import exact_percentiles

    li = t(spark, sf_dir, "lineitem")
    res = exact_percentiles(
        li.select("l_returnflag", "l_extendedprice"),
        "l_returnflag",
        "l_extendedprice",
        [0.5, 0.95],
        with_min_max=True,
        # value_buckets rides the default "auto" policy: a cheap
        # per-key distinct-count pre-pass keeps the single-window
        # cumulation below AUTO_BUCKET_THRESHOLD (measured sf0.1:
        # 180k distincts/key sort in one task in 1.75 s vs 3.21 s
        # bucketed) and switches to the bit-identical bucketed form
        # when per-key distincts outgrow a single task's sort (the
        # 100 TB setting) — no manual flag either way.
    )
    return res.select(
        "l_returnflag",
        F.round(F.col("p50"), 6).alias("median_price"),
        F.round(F.col("p95"), 6).alias("p95_price"),
        F.round(F.col("vmin"), 2).alias("min_price"),
        F.round(F.col("vmax"), 2).alias("max_price"),
    )


@register(
    "q11_segment_nation_setops",
    oracle="""
    WITH b AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         m AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    SELECT 'union' AS op, c_nationkey FROM (SELECT * FROM b UNION SELECT * FROM m)
    UNION ALL
    SELECT 'intersect' AS op, c_nationkey FROM (SELECT * FROM b INTERSECT SELECT * FROM m)
    UNION ALL
    SELECT 'except' AS op, c_nationkey FROM (SELECT * FROM b EXCEPT SELECT * FROM m)
    """,
    tags=("setops",),
)
def q11_segment_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (union/intersect/except) — absent from the
    reference (SURVEY.md §2.6 note) but 1-line engine capability."""
    c = t(spark, sf_dir, "customer")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    m = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey").distinct()
    tag = lambda df, op: df.withColumn("op", F.lit(op)).select("op", "c_nationkey")  # noqa: E731
    return (
        tag(b.union(m).distinct(), "union")
        .unionByName(tag(b.intersect(m), "intersect"))
        .unionByName(tag(b.exceptAll(m).distinct(), "except"))
    )


@register(
    "q12_event_type_cardinality",
    oracle="""
    SELECT event_type,
           count(*)                 AS n_events,
           count(DISTINCT user_id)  AS n_users,
           round(sum(value), 4)     AS total_value
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "distinct"),
)
def q12_event_type_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark).
    The approximate twin (approx_count_distinct / HLL) is registered
    separately as a rows-only check — sketches can't hash-match DuckDB."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "q91_approx_distinct_users",
    oracle=None,  # HLL sketch values are engine-specific → rows-only check
    tags=("agg", "approx"),
)
def q91_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): at 100 TB the exact distinct's
    expand+shuffle is the bottleneck; the sketch is one pass, fixed
    memory. rsd pinned so results are deterministic for a given input."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "q14_rollup_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                          AS n_orders,
           round(sum(o_totalprice), 2)       AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def q14_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — one shuffle produces all grouping sets."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "q15_cube_region_segment",
    oracle="""
    SELECT coalesce(r.r_name, 'ALL')       AS region,
           coalesce(c.c_mktsegment, 'ALL') AS segment,
           count(*)                        AS n_customers
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY CUBE (r.r_name, c.c_mktsegment)
    """,
    tags=("agg", "cube"),
)
def q15_cube_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over a snowflake join: all 2^2 grouping sets in one pass."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.cube("r_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("c_mktsegment"), F.lit("ALL")).alias("segment"),
            "n_customers",
        )
    )


@register(
    "q45_sql_view_consumption",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_finished,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    LIMIT 20
    """,
    tags=("sql", "view"),
)
def q45_sql_view_consumption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 as a first-class path: createOrReplaceTempView + a raw SQL
    string through the full parse → analyze → optimize lifecycle —
    the reference's gold-consumption pattern
    (/root/reference/read_gold.py:36-54: temp view, CASE WHEN flag
    counting, ORDER BY, LIMIT), on the orders table."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_finished,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders_v
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        LIMIT 20
        """
    )


@register(
    "q65_unpivot_measures",
    oracle="""
    SELECT measure,
           round(sum(value), 2)  AS total,
           round(avg(value), 6)  AS avg_value,
           CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY measure
    """,
    tags=("unpivot", "agg"),
)
def q65_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long via the native unpivot/melt operator (the workload
    form of the bronze stack, SURVEY.md §2.7 F8): four lineitem
    measures to (measure, value) rows, aggregated per measure. The
    unpivot is a narrow Expand node — rows ×4 before the map-side
    partial agg collapses them, so the shuffle stays |measures| rows
    per task regardless of input size."""
    li = t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.round(F.sum("value"), 2).alias("total"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count("*").alias("n"),
    )


@register(
    "q54_subquery_above_average",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_big_orders,
           round(avg(o_totalprice), 4) AS avg_big_price
    FROM orders o
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
          )
    GROUP BY o_orderstatus
    """,
    tags=("sql", "subquery"),
)
def q54_subquery_above_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated subqueries through Catalyst's subquery
    rewrite: orders priced above 1.5x the global average (uncorrelated
    scalar subquery → one-row broadcast) that also contain at least one
    bulk line item (correlated EXISTS → left-semi join). Both rewrites
    are Catalyst's, not hand-built: the scalar aggregate computes once
    and broadcasts — no per-row recomputation — and the EXISTS becomes
    a semi-join keyed on o_orderkey, so the whole plan is two shuffles
    at any scale."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_sq")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_big_orders,
               round(avg(o_totalprice), 4) AS avg_big_price
        FROM orders_sq o
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders_sq)
          AND EXISTS (
                SELECT 1 FROM lineitem_sq l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
              )
        GROUP BY o_orderstatus
        """
    )


@register(
    "q58_explicit_grouping_sets",
    oracle="""
    SELECT c_mktsegment,
           c_nationkey,
           GROUPING(c_mktsegment, c_nationkey) AS gid,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_balance
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    tags=("agg", "grouping-sets"),
)
def q58_explicit_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of q14's rollup and
    q15's cube: two independent one-dimensional breakdowns plus the
    grand total in ONE pass over customer (Catalyst expands the sets
    into a single Expand + hash-agg, so the table is scanned once, not
    three times). grouping_id disambiguates the null-as-aggregated
    rows from genuine nulls."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment,
               c_nationkey,
               GROUPING_ID(c_mktsegment, c_nationkey) AS gid,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_balance
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@register(
    "r08_lateral_topk_per_region",
    oracle="""
    SELECT r.r_name, c.c_name, c.c_acctbal
    FROM region r,
    LATERAL (
      SELECT c_name, c_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_regionkey = r.r_regionkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 3
    ) c
    """,
    tags=("join", "lateral", "topk"),
)
def r08_lateral_topk_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the top-3 customers by balance for
    each region, written as a lateral per-row subquery — the SQL-standard
    form users reach for before discovering window functions. Catalyst
    decorrelates it into the window/rank plan rather than executing a
    per-row subquery (compare q67, the explicit window form): the
    rewrite is the point — declarative lateral SQL, distributed
    ranking execution, no nested-loop subquery per driving row."""
    for name in ("region", "nation", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"__lat_{name}")
    return spark.sql(
        """
        SELECT r.r_name, c.c_name, c.c_acctbal
        FROM __lat_region r,
        LATERAL (
          SELECT c_name, c_acctbal
          FROM __lat_customer JOIN __lat_nation ON c_nationkey = n_nationkey
          WHERE n_regionkey = r.r_regionkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 3
        ) c
        """
    )
