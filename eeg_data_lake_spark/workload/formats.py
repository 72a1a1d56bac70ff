"""Format/type-surface workload: VARIANT semi-structured columns,
full-outer reconciliation, and ORC / JSON-lines round-trips.

These widen the S-family (sources/sinks) and type coverage beyond the
reference's text/CSV/parquet/Delta set: Spark 4's VARIANT type for
schemaless JSON (the open-table-format successor to string-typed
props), the one join shape the engine didn't yet register
(full outer), and lossless round-trips through the two other
first-class columnar/row formats Spark ships built-in.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import register, t


@register(
    "q80_variant_props",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER)
               AS k_bucket,
           COUNT(*)                                   AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           round(avg(value), 4)                       AS avg_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
    tags=("variant", "json", "semi-structured"),
)
def q80_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    parse_json once into a VARIANT column, then typed variant_get
    extraction — the engine-native path for schemaless JSON at scale
    (VARIANT stores a parsed binary encoding, so repeated field access
    skips re-tokenizing the JSON text, and shredded storage can prune).
    Contrast with q24, which string-parses via get_json_object on every
    access. One hash-agg shuffle on the derived bucket."""
    e = t(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "int")
    return (
        e.select((k % 10).alias("k_bucket"), "event_type", "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )


@register(
    "q81_full_outer_reconciliation",
    oracle="""
    WITH od AS (
      SELECT CAST(o_orderdate AS VARCHAR) AS day, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    ), ed AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT COALESCE(od.day, ed.day)   AS day,
           COALESCE(od.n_orders, 0)   AS n_orders,
           COALESCE(ed.n_events, 0)   AS n_events,
           CASE WHEN od.day IS NULL THEN 'events_only'
                WHEN ed.day IS NULL THEN 'orders_only'
                ELSE 'both' END       AS presence
    FROM od FULL OUTER JOIN ed ON od.day = ed.day
    ORDER BY day
    """,
    tags=("join", "full-outer", "reconciliation"),
)
def q81_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (the one join family not yet registered): daily
    order counts reconciled against daily event counts, null-extended
    on both sides with a presence label — the standard two-system
    audit/reconciliation shape. Both inputs are pre-aggregated to one
    row per day BEFORE the join, so the full-outer shuffle moves
    |days|, not |rows|, and the join key is the pre-agg key (AQE reuses
    the partitioning)."""
    od = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ed = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    o, e = od.alias("o"), ed.alias("e")
    return (
        o.join(e, F.col("o.day") == F.col("e.day"), "full_outer")
        .select(
            F.coalesce(F.col("o.day"), F.col("e.day")).alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.when(F.col("o.day").isNull(), "events_only")
            .when(F.col("e.day").isNull(), "orders_only")
            .otherwise("both")
            .alias("presence"),
        )
        .orderBy("day")
    )


def _rt_dir(sf_dir: str, tag: str) -> str:
    """Per-(sf_dir, process) scratch dir for round-trip sinks. The pid
    component keeps concurrent runs (correctness harness + bench, or
    parallel pytest workers) from racing overwrite-vs-scan on one
    shared directory; within a process, reruns reuse and overwrite the
    same path."""
    import os

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/eeg_format_rt/{tag}_{h}_{os.getpid()}"


@register(
    "q82_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)                         AS n,
           round(sum(l_quantity), 2)        AS sum_qty,
           round(sum(l_extendedprice), 2)   AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("source", "sink", "orc"),
)
def q82_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (S-family add: the second columnar format Spark
    ships natively): project lineitem to the needed columns, write ORC,
    re-read, aggregate. The aggregate must equal the oracle computed on
    the original parquet — proving the round-trip is lossless for
    string/double columns and that predicate/projection pushdown has an
    equivalent columnar path outside parquet. The write is partitioned
    prune-ably by the group key."""
    path = _rt_dir(sf_dir, "lineitem_orc")
    t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).write.mode("overwrite").partitionBy("l_returnflag").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q83_jsonl_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*)                 AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(max(doc_id) AS BIGINT)  AS max_doc_id
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("source", "sink", "json"),
)
def q83_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema'd scan (the interchange format every
    crawl/annotation pipeline speaks): write documents as JSONL,
    re-read with the original schema pinned (never inferSchema in
    production — one pass, no sampling job), aggregate, and match the
    oracle computed on the original parquet. Long/string columns
    round-trip exactly through JSON text; the scan stays splittable
    because JSONL is line-delimited."""
    path = _rt_dir(sf_dir, "documents_jsonl")
    d = t(spark, sf_dir, "documents")
    d.write.mode("overwrite").json(path)
    back = spark.read.schema(d.schema).json(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


@register(
    "q85_map_props_functions",
    oracle="""
    WITH kv AS (
      SELECT unnest(json_keys(props)) AS prop_key, props, value
      FROM events
    )
    SELECT prop_key,
           COUNT(*)                                                   AS n_rows,
           round(avg(CAST(json_extract_string(props, '$.' || prop_key)
                          AS INTEGER)), 4)                            AS avg_prop,
           CAST(max(CAST(json_extract_string(props, '$.' || prop_key)
                         AS INTEGER)) AS INTEGER)                     AS max_prop,
           round(avg(value), 4)                                       AS avg_value
    FROM kv
    GROUP BY prop_key
    ORDER BY prop_key
    """,
    tags=("map", "json", "types"),
)
def q85_map_props_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface over the props JSON: from_json into
    map<string,int> ONCE, then the map-native explode into (key, value)
    entry rows — instead of re-parsing the JSON text per field access.
    Generic over whatever keys appear in the data (the oracle unnests
    json_keys the same way); one hash-agg shuffle keyed by prop key."""
    e = t(spark, sf_dir, "events").withColumn(
        "m", F.from_json("props", "map<string,int>")
    )
    kv = e.select(
        F.explode("m").alias("prop_key", "prop_val"),
        "value",
    )
    return (
        kv.groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("prop_val"), 4).alias("avg_prop"),
            F.max("prop_val").cast("int").alias("max_prop"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("prop_key")
    )


@register(
    "r11_xml_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("source", "sink", "xml"),
)
def r11_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + scan — native in Spark 4 (the spark-xml package
    folded into core): write the nation dimension as row-tagged XML,
    re-read with the schema pinned, and return the rows themselves
    (small dimension → the oracle checks full content, not just an
    aggregate). XML is the interchange format of enterprise feeds
    (financial, healthcare, legal corpora); schema-pinned reads keep
    the scan single-pass — inferSchema on XML costs an extra full
    parse of every file, which at 100 TB is the difference between
    one scan and two."""
    path = _rt_dir(sf_dir, "nation_xml")
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    n.write.format("xml").mode("overwrite").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(path)
    back = (
        spark.read.format("xml")
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .option("rowTag", "nation")
        .load(path)
    )
    return back.select("n_nationkey", "n_name", "n_regionkey").orderBy(
        "n_nationkey"
    )
