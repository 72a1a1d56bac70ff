"""Advanced join workload: as-of, range, and embedding near-dup pairs
(north-star ops beyond the reference's single left equi-join J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.allpairs import cosine_neardup_pairs
from eeg_data_lake_spark.operators.joins import asof_join, range_count_join
from eeg_data_lake_spark.workload.registry import register, t

COSINE_NEARDUP_TAU = 0.45


@register(
    "q50_asof_join_last_order",
    oracle="""
    SELECT e.event_id, e.user_id,
           o.last_order_key, o.last_order_date
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o_orderkey  AS last_order_key,
             o_orderdate AS last_order_date
      FROM orders
      WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 1
    ) o ON TRUE
    """,
    tags=("join", "asof"),
)
def q50_asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event gains the user's most recent order at or
    before the event time (ties on order date broken by greatest order
    key). Union+window plan — one shuffle of |events|+|orders| on
    user, no inequality-join pair blow-up; the oracle spells the same
    semantics as a LATERAL top-1."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_orderdate").alias("last_order_date"),
    )
    out = asof_join(
        e, o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=("last_order_key",),
    )
    return out.select("event_id", "user_id", "last_order_key", "last_order_date")


@register(
    "q13_range_join_order_activity",
    oracle="""
    SELECT o.o_orderkey,
           count(e.event_id) AS n_event_id
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_orderdate
     AND e.ts <  o.o_orderdate + INTERVAL 7 DAY
    GROUP BY o.o_orderkey
    """,
    tags=("join", "range"),
)
def q13_range_join_order_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events of the ordering user within 7 days of each
    order. Hash equi-join on the user key with the time range as a
    residual predicate — never a nested-loop; per-key fan-out bounded
    by user activity."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return range_count_join(
        o, e,
        on=("o_custkey", "user_id"),
        right_ts="ts",
        range_start=F.col("o_orderdate"),
        range_end=F.col("o_orderdate") + F.expr("INTERVAL 7 DAY"),
        count_col="event_id",
        group_cols=("o_orderkey",),
    )


@register(
    "q36_embedding_neardup_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= {COSINE_NEARDUP_TAU}
    """,
    tags=("dedup", "similarity", "neardup"),
)
def q36_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.45), exact, via the
    size-adaptive all-pairs operator: small corpora take a zero-shuffle
    broadcast matmul; corpora past the cutover take the hash-blocked
    pairwise matmul whose task memory is bounded by the block size, so
    the registered plan never collects an unbounded corpus on the
    driver. The ANN paths (q93 LSH / q99 IVF) are the sub-quadratic
    approximate alternative; this exact form is their recall oracle.
    """
    v = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cosine_neardup_pairs(v, COSINE_NEARDUP_TAU)


@register(
    "q55_salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "skew", "salting"),
)
def q55_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join surfaced as a verified query: lineitem
    (the fact side, where one hot orderkey would pile onto a single
    reducer) joined to orders through operators.skew.salted_join with
    8 salt buckets, then aggregated. The oracle is the PLAIN join —
    hash-matching it proves salting is invisible to semantics: every
    (key, salt) bucket finds exactly its matches and nothing is
    duplicated. On uniform TPC-H keys salting is pure overhead (8x
    build replication); it pays off when one key holds >> 1/shuffle-
    partitions of the rows — boilerplate doc synsets, celebrity users
    — which is why it is an explicit operator, not a default."""
    from eeg_data_lake_spark.operators.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, on=["o_orderkey"], how="inner", salt_buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "r02_embedding_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))) >= {COSINE_NEARDUP_TAU}
    ),
    edges AS (
      SELECT va AS a, vb AS b FROM pairs
      UNION SELECT vb, va FROM pairs
    ),
    reach(node, other) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, r.other FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node, CAST(min(other) AS BIGINT) AS component
    FROM reach GROUP BY node
    """,
    tags=("dedup", "similarity", "graph", "iterative"),
)
def r02_embedding_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS: the q36 cosine pair graph collapsed
    into dedup groups by iterative min-label propagation — the last
    step of semantic dedup, where each cluster keeps one
    representative. Same composition as q48 (shingle pairs → CC) but
    over the embedding modality; at scale the exact pair step swaps
    for the LSH/IVF candidate generation (q93/q99) with the SAME
    cluster step, because connected_components only sees (src, dst)
    edges and is agnostic to how candidates were found. The oracle
    recomputes components with a recursive CTE (transitive closure —
    viable at oracle scale only, which is exactly why the engine
    iterates)."""
    from eeg_data_lake_spark.operators.graph import connected_components

    pairs = q36_embedding_neardup_pairs(spark, sf_dir)
    return connected_components(pairs, src="vec_a", dst="vec_b").select(
        "node", "component"
    )


# --------------------------------------------------------------------
# r36/r37: deep multi-join plans (TPC-H Q5 / Q21 shapes)
# --------------------------------------------------------------------


@register(
    "r36_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
    GROUP BY n.n_name
    """,
    tags=("joins", "tpch-q5", "multi-join"),
)
def r36_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5's plan class: a six-way join where revenue counts only
    when the supplier sits in the customer's own nation, rolled up per
    nation for two regions.

    The join-order story IS the query: lineitem (the fact) is joined
    exactly once and never shuffled for the dimensions — orders joins
    by broadcast, then supplier by broadcast with the s_nationkey =
    c_nationkey residual folded into the SAME join (not a post-filter
    pass), then nation/region prune to 2 of 5 regions. With CBO-less
    Catalyst this falls out of writing dims-last + broadcast()
    explicitly; the only exchange left is the 25-group final agg. At
    100 TB lineitem⋈orders becomes a shuffle join on l_orderkey and
    everything else stays broadcast — same declared plan."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    nat = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "r37_sole_failing_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    ord AS (
      SELECT l_orderkey, count(*) AS n_sup, sum(has_r) AS n_r
      FROM per GROUP BY l_orderkey
    )
    SELECT s.s_name AS s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per p JOIN ord o USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    WHERE p.has_r = 1 AND o.n_sup >= 2 AND o.n_r = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name LIMIT 10
    """,
    tags=("joins", "tpch-q21", "correlated-exists"),
)
def r37_sole_failing_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's plan class (adapted to this schema's columns):
    suppliers who were the ONLY supplier with a returned line on a
    multi-supplier order, ranked by how often. The textbook SQL is an
    EXISTS (another supplier shipped) + NOT EXISTS (no other supplier
    failed) pair of correlated self-joins against lineitem — three
    passes over the fact at 100 TB.

    This plan replaces both correlated subqueries with aggregation
    reuse: collapse lineitem once to (order, supplier, has_r) —
    lineitem's ONLY shuffle — derive per-order supplier/failure counts
    from that relation (map-side-combinable second agg over a key it
    is already partitioned by), and the EXISTS/NOT-EXISTS semantics
    become scalar predicates (n_sup >= 2 AND n_r = 1). Supplier names
    broadcast; TakeOrderedAndProject caps the output."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_r")
    )
    ordstats = per.groupBy("l_orderkey").agg(
        F.count("*").alias("n_sup"), F.sum("has_r").alias("n_r")
    )
    return (
        per.join(ordstats, "l_orderkey")
        .filter(
            (F.col("has_r") == 1)
            & (F.col("n_sup") >= 2)
            & (F.col("n_r") == 1)
        )
        .join(F.broadcast(s), per.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "r50_bloom_prefilter_join",
    oracle="""
    WITH small AS (
      SELECT o_orderkey AS orderkey FROM orders WHERE o_custkey % 97 = 0
    )
    SELECT CAST(count(*) AS BIGINT)                                AS n_items,
           CAST(count(DISTINCT l.orderkey) AS BIGINT)              AS n_orders,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)   AS revenue
    FROM (SELECT l_orderkey AS orderkey, l_extendedprice, l_discount
          FROM lineitem) l
    JOIN small USING (orderkey)
    """,
    tags=("join", "bloom", "runtime-filter", "scale"),
)
def r50_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered selective join: the ~1% of orders that match
    the predicate build a distributed Bloom filter (one bit_or shuffle
    bounded by the bitmap size); lineitem rows are pruned by k
    codegen'd bitmap probes BEFORE any exchange, then the exact join
    eliminates the false positives — so the result is bit-identical to
    the plain join (the oracle) while the shuffled volume drops to
    ~|matches| + FP. This is the explicit form of Catalyst's
    InjectRuntimeFilter for cases its thresholds decline (see
    operators/bloomjoin.py for sizing math)."""
    from eeg_data_lake_spark.operators.bloomjoin import bloom_prefiltered_join

    small = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 97 == 0)
        .select(F.col("o_orderkey").alias("orderkey"))
    )
    large = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice", "l_discount"
    )
    joined = bloom_prefiltered_join(large, small, "orderkey", n_bits=1 << 16)
    return joined.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("orderkey").alias("n_orders"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "r51_asof_join_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id,
           o.last_order_key, o.last_order_date
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o_orderkey  AS last_order_key,
             o_orderdate AS last_order_date
      FROM orders
      WHERE o_custkey = e.user_id
        AND o_orderdate <= e.ts
        AND o_orderdate >= e.ts - INTERVAL 9000 DAY
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 1
    ) o ON TRUE
    """,
    tags=("join", "asof", "tolerance"),
)
def r51_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q50's as-of join with a 9000-day lookback bound (pandas
    merge_asof `tolerance`, sized so the bound genuinely splits the
    testdata's 8190-9799-day event-to-order gaps): matches older than
    the window yield NULL.
    Same single union+window exchange — the matched right timestamp
    rides in the payload struct and the bound is one post-window
    comparison, where a naive formulation would re-join or carry an
    inequality predicate into the join itself."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_orderdate").alias("last_order_date"),
    )
    out = asof_join(
        e, o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        tie_breakers=("last_order_key",),
        tolerance=F.expr("INTERVAL '9000' DAY"),
    )
    return out.select("event_id", "user_id", "last_order_key", "last_order_date")


@register(
    "r53_interval_overlap_join",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts + INTERVAL 30 MINUTE) AS e
      FROM events
    )
    SELECT a.user_id,
           a.event_id AS id_a,
           b.event_id AS id_b,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND a.s <= b.e AND b.s <= a.e
    """,
    tags=("join", "interval", "overlap"),
)
def r53_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-activity detection: every pair of 30-minute event
    windows of the same user that overlap in time, with the exact
    overlap duration. The oracle spells the quadratic inequality
    self-join; the registered plan is the bin-and-verify equi join
    (operators/joins.interval_overlap_join) whose candidates are keyed
    by (user, 30-min bin) and whose count-once rule needs no distinct
    — the construction that keeps interval joins hash-partitionable
    at 100 TB. Integer-microsecond time math on both engines."""
    from eeg_data_lake_spark.operators.joins import interval_overlap_join

    iv = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        F.unix_micros(
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).cast("timestamp")
        ).alias("e"),
    )
    return interval_overlap_join(
        iv,
        keys=["user_id"],
        id_col="event_id",
        start_us="s",
        end_us="e",
        bin_us=30 * 60 * 1_000_000,
    )


@register(
    "r81_skew_aware_hot_key_join",
    oracle="""
    WITH d AS (
      SELECT event_type, avg(value) AS ty_avg FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*)               AS n_events,
           round(sum(e.value), 2) AS total_value,
           round(max(d.ty_avg), 6) AS ty_avg
    FROM events e JOIN d USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("join", "skew", "salting", "auto-policy"),
)
def r81_skew_aware_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew auto-policy surfaced as a verified query: events
    enriched with their type's mean value through
    ``operators.skew.skew_aware_join``, which diagnoses the fact
    side's key distribution (r59's numbers) and routes plain / salted
    / AQE-trusted itself — q55 is the hand-wired salted form, this is
    the policy doing the wiring. events.event_type is the honest
    hot-key shape: ~5 uniform types means the hottest key holds ~n/5
    rows, 6x an average reducer's share at 32 shuffle partitions, so
    the diagnostic routes SALTED here (asserted in
    tests/test_skew_policy.py) and the oracle is the PLAIN join —
    hash-matching proves the policy's routing is invisible to
    semantics at every scale. The per-type dim is broadcast-sized at
    test SF; the policy targets the shuffle that exists when it
    isn't."""
    from eeg_data_lake_spark.operators.skew import skew_aware_join

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("ty_avg"))
    joined = skew_aware_join(ev, dim, on=["event_type"], how="inner")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.max("ty_avg"), 6).alias("ty_avg"),
    )
