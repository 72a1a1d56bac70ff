"""Version-keyed result cache: compute-once per version, recompute on
commit, replay no-op, vacuum retention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.resultcache import cached_result, vacuum_cache
from eeg_data_lake_spark.sources.txlog import TxTable


@pytest.fixture()
def tables(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "src"))
    cache = TxTable(spark, str(tmp_path / "cache"))
    src.append(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    return src, cache


def _agg(calls):
    def compute(df):
        calls.append(1)
        return df.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
        )

    return compute


def test_compute_once_then_serve_from_cache(spark, tables):
    src, cache = tables
    calls: list[int] = []
    a = cached_result(src, cache, _agg(calls), "t1").collect()
    b = cached_result(src, cache, _agg(calls), "t1").collect()
    assert len(calls) == 1  # second call never recomputed
    assert a == b and a[0].n == 2 and a[0].total == 30.0


def test_new_commit_invalidates(spark, tables):
    src, cache = tables
    calls: list[int] = []
    cached_result(src, cache, _agg(calls), "t1")
    src.append(spark.createDataFrame([(3, 30.0)], "k long, v double"))
    out = cached_result(src, cache, _agg(calls), "t1").collect()
    assert len(calls) == 2
    assert out[0].n == 3 and out[0].total == 60.0
    # old version's result still queryable in the cache table rows
    hist = cache.read().select("_source_version").distinct().count()
    assert hist == 2


def test_tags_namespace_and_vacuum(spark, tables):
    src, cache = tables
    calls: list[int] = []
    cached_result(src, cache, _agg(calls), "a")
    src.append(spark.createDataFrame([(3, 30.0)], "k long, v double"))
    cached_result(src, cache, _agg(calls), "a")
    n = vacuum_cache(cache, "a", keep_versions=1)
    assert n == 1  # one row per version for this aggregate
    # the kept (current) version still serves without recompute
    before = len(calls)
    cached_result(src, cache, _agg(calls), "a")
    assert len(calls) == before


def test_empty_source_refused(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "s2"))
    cache = TxTable(spark, str(tmp_path / "c2"))
    with pytest.raises(ValueError, match="no data"):
        cached_result(src, cache, lambda df: df, "x")
