"""df.observe() instrumentation: pipeline QC metrics collected at
action time from the SAME pass as the real work — no second scan.
This is the production pattern for row-count / null-rate / range
assertions on every medallion build (a separate validation query would
double the 100 TB read).

Spark 4.1 caveat (why NON-TEST source avoids Observation): the first
Observation in a session materializes SparkSession's lazy, non-
serializable observationManager field, after which any closure that
captures the session (MLlib models carrying a trainingSummary into
their transform UDF) fails task serialization. See
tests/test_chunkstore.py::test_gc_does_not_poison_session_serialization;
these tests run AFTER the suite's MLlib modules in alphabetical order,
so the capability demo stays safe here."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.readers import read_testdata


def test_observe_collects_qc_metrics_in_one_pass(spark, sf_dir):
    e = read_testdata(spark, sf_dir, "events")
    obs = Observation("qc")
    instrumented = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    # the "real work": a gold-style aggregate driven by one action
    out = (
        instrumented.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    m = obs.get
    assert m["n_rows"] == sum(r.n for r in out)
    assert m["null_values"] == 0
    assert m["min_value"] <= m["max_value"]


def test_observed_metrics_match_direct_aggregate(spark, sf_dir):
    e = read_testdata(spark, sf_dir, "events")
    obs = Observation("qc2")
    e.observe(obs, F.avg("value").alias("avg_value")).write.format(
        "noop"
    ).mode("overwrite").save()
    direct = e.agg(F.avg("value")).first()[0]
    assert abs(obs.get["avg_value"] - direct) < 1e-9
