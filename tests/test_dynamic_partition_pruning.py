"""Dynamic partition pruning (DPP): joining a date-partitioned fact
to a filtered dim must inject a runtime `dynamicpruning` subquery into
the fact scan's PartitionFilters, so only the dim-selected partitions
are read — THE scan lever at 100 TB (a 3-of-N-dates dim filter must
read 3 partitions, not the table). Static pruning can't do this: the
selective predicate lives on the dim, not the fact.

Pins both halves: the plan carries the DPP filter, and the result
matches the statically-pruned equivalent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.plans import explain_string


@pytest.fixture(scope="module")
def partitioned_fact(spark, sf_dir, tmp_path_factory):
    """events re-written partitioned by event_date (the layout a real
    ingest produces — sources/writers.py partitions the same way)."""
    out = str(tmp_path_factory.mktemp("dpp") / "events_by_date")
    (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(out)
    )
    return out


def _dim(spark, fact):
    """3-date dimension with a selective flag — the pruning source."""
    dates = [r[0] for r in fact.select("event_date").distinct().orderBy("event_date").limit(3).collect()]
    return spark.createDataFrame(
        [(d, "keep") for d in dates], "event_date date, tag string"
    )


def test_dpp_filter_reaches_fact_scan(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    dim = _dim(spark, fact)
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "event_date")
    plan = explain_string(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_dpp_result_matches_static_pruning(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    dim = _dim(spark, fact)
    dates = [r[0] for r in dim.select("event_date").collect()]
    dyn = (
        fact.join(dim.filter(F.col("tag") == "keep"), "event_date")
        .groupBy("event_date")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    static = (
        fact.filter(F.col("event_date").isin(dates))
        .groupBy("event_date")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    a = {(r.event_date, r.n, round(r.v, 6)) for r in dyn.collect()}
    b = {(r.event_date, r.n, round(r.v, 6)) for r in static.collect()}
    assert a == b and len(a) == 3
