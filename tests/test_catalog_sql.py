"""SQL DDL / catalog surface: CREATE TABLE ... PARTITIONED BY, INSERT
INTO, dynamic-partition INSERT OVERWRITE, ALTER TABLE ADD COLUMNS,
SHOW PARTITIONS, partition-pruned scans, and ANALYZE TABLE driving
stats-based broadcast selection — the managed-table workflow a SQL
user of the engine runs (the reference's Delta tables play this role;
ours are catalog parquet tables + the txlog for ACID paths)."""

from __future__ import annotations

import uuid

import pytest

from eeg_data_lake_spark.plans import explain_string, join_strategies


@pytest.fixture()
def tname(spark):
    name = f"t_{uuid.uuid4().hex[:10]}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"DROP TABLE IF EXISTS {name}_dim")


def test_ddl_partitioned_insert_prune_alter(spark, tname):
    spark.sql(
        f"CREATE TABLE {tname} (id BIGINT, v DOUBLE, day STRING)"
        " USING parquet PARTITIONED BY (day)"
    )
    spark.sql(
        f"INSERT INTO {tname} VALUES (1, 1.5, 'd1'), (2, 2.5, 'd1'),"
        " (3, 3.5, 'd2')"
    )
    spark.sql(f"INSERT INTO {tname} VALUES (4, 4.5, 'd3')")
    parts = {r[0] for r in spark.sql(f"SHOW PARTITIONS {tname}").collect()}
    assert parts == {"day=d1", "day=d2", "day=d3"}

    # partition filter must prune at planning time, not post-scan
    q = spark.table(tname).filter("day = 'd1'")
    plan = explain_string(q)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200]
    assert q.count() == 2

    # additive evolution: old rows read NULL for the new column
    spark.sql(f"ALTER TABLE {tname} ADD COLUMNS (note STRING)")
    spark.sql(f"INSERT INTO {tname} VALUES (5, 5.5, 'hello', 'd3')")
    got = {r.id: r.note for r in spark.table(tname).collect()}
    assert got[5] == "hello" and got[1] is None


def test_dynamic_partition_overwrite(spark, tname):
    spark.sql(
        f"CREATE TABLE {tname} (id BIGINT, day STRING)"
        " USING parquet PARTITIONED BY (day)"
    )
    spark.sql(f"INSERT INTO {tname} VALUES (1, 'd1'), (2, 'd2')")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # dynamic mode: only the partitions present in the data are
        # replaced — d2 must survive
        spark.sql(f"INSERT OVERWRITE TABLE {tname} VALUES (10, 'd1')")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    assert sorted(map(tuple, spark.table(tname).collect())) == [
        (2, "d2"),
        (10, "d1"),
    ]


def test_analyze_table_and_column_statistics(spark, tname):
    """ANALYZE TABLE populates exact row counts and per-column
    min/max/NDV in the catalog — the inputs CBO join-reordering and
    size estimation read. (For parquet path tables Spark already sizes
    from the file listing, so a tiny dim broadcasts with or without
    stats — asserted too, since that's the planner behavior users see.)
    """
    spark.sql(f"CREATE TABLE {tname} (k BIGINT, v DOUBLE) USING parquet")
    spark.range(0, 10_000).selectExpr("id AS k", "id * 1.0 AS v").write.mode(
        "append"
    ).insertInto(tname)
    spark.sql(f"CREATE TABLE {tname}_dim (k BIGINT, name STRING) USING parquet")
    spark.range(0, 50).selectExpr("id AS k", "CAST(id AS STRING) AS name").write.mode(
        "append"
    ).insertInto(f"{tname}_dim")

    spark.sql(f"ANALYZE TABLE {tname}_dim COMPUTE STATISTICS FOR ALL COLUMNS")
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {tname}_dim").collect()
    stats_row = [r for r in desc if r.col_name == "Statistics"]
    assert stats_row and "50 rows" in stats_row[0].data_type
    col = {
        r.info_name: r.info_value
        for r in spark.sql(f"DESCRIBE EXTENDED {tname}_dim k").collect()
    }
    assert col["min"] == "0" and col["max"] == "49"
    assert col["distinct_count"] == "50"

    joined = spark.table(tname).join(spark.table(f"{tname}_dim"), "k")
    assert "BroadcastHashJoin" in join_strategies(joined)


def test_nested_struct_schema_pruning(spark, tmp_path):
    """Selecting one subfield of a struct must prune the parquet
    ReadSchema down to that leaf — at 100 TB reading `meta.lang` must
    not drag the sibling blob field off disk."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "nested")
    spark.range(0, 100).select(
        "id",
        F.struct(
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
            F.repeat(F.lit("x"), 1000).alias("blob"),
        ).alias("meta"),
    ).write.parquet(p)
    q = spark.read.parquet(p).select("id", "meta.lang")
    plan = explain_string(q)
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "lang" in read_schema
    assert "blob" not in read_schema  # sibling leaf pruned
    assert q.count() == 100
