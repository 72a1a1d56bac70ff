"""skew_aware_join's auto-routing (operators/skew.py): skewed input
fires the salted plan, uniform input stays plain, both row-identical
to the plain join; streaming stays lazy; catalog stats prove
near-unique keys plain with no job; non-salt-safe join types downgrade
to the AQE-trusted plain join; the decision is observable
(last_skew_route) and memoized."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators import skew as S
from eeg_data_lake_spark.operators.skew import skew_aware_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    """Clear the memo AND pin a realistic reducer count: the hot-key
    rule is max_n > factor * n/partitions (AQE's own), and at the
    test session's 4 shuffle partitions NO key can be hot under
    factor 5 — correctly, since 5 keys over 4 reducers is already
    balanced. 32 reducers is the scale the policy exists for."""
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    S._SKEW_CACHE.clear()
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prior)
    S._SKEW_CACHE.clear()


def test_hot_key_routes_salted_and_matches_plain(spark):
    # one key holds half the rows: 50 >> 5 * 100/32
    left = spark.createDataFrame(
        [("hot", i) for i in range(50)]
        + [(f"k{i}", i) for i in range(50)],
        "k string, v long",
    )
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", "C") for i in range(50)],
        "k string, tag string",
    )
    got = skew_aware_join(left, right, ["k"])
    route = S.last_skew_route()
    assert route.source == "diagnostic"
    assert route.strategy == "salted"
    assert route.max_key_rows == 50 and route.n_rows == 100
    assert 2 <= route.salt_buckets <= 32
    # the salted construction is visible in the plan (salt join key)
    assert "__salt" in got._jdf.queryExecution().optimizedPlan().toString()
    assert _rows(got) == _rows(left.join(right, ["k"]))


def test_uniform_keys_route_plain(spark):
    left = spark.createDataFrame(
        [(f"k{i % 40}", i) for i in range(120)], "k string, v long"
    )
    right = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40)], "k string, w long"
    )
    got = skew_aware_join(left, right, ["k"])
    route = S.last_skew_route()
    assert route.strategy == "plain" and route.source == "diagnostic"
    assert route.max_key_rows == 3
    assert "__salt" not in got._jdf.queryExecution().optimizedPlan().toString()
    assert _rows(got) == _rows(left.join(right, ["k"]))


def test_memo_serves_repeat_calls(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 1)], "k string, v long"
    )
    right = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, w long")
    first = skew_aware_join(left, right, ["k"])
    assert S.last_skew_route().source == "diagnostic"
    second = skew_aware_join(left, right, ["k"])
    route = S.last_skew_route()
    assert route.source == "memo" and route.strategy == "salted"
    assert _rows(second) == _rows(first)


def test_hot_but_not_salt_safe_downgrades_to_aqe(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 1)], "k string, v long"
    )
    right = spark.createDataFrame([("hot", 1), ("x", 2)], "k string, w long")
    got = skew_aware_join(left, right, ["k"], how="full_outer")
    route = S.last_skew_route()
    assert route.strategy == "aqe" and route.salt_buckets is None
    assert _rows(got) == _rows(left.join(right, ["k"], "full_outer"))
    # and the cached decision still salts a salt-safe re-route
    got_inner = skew_aware_join(left, right, ["k"])
    route = S.last_skew_route()
    assert route.source == "memo" and route.strategy == "salted"
    assert _rows(got_inner) == _rows(left.join(right, ["k"]))


def test_forced_strategies_skip_the_estimate(spark, monkeypatch):
    left = spark.createDataFrame([("a", 1)], "k string, v long")
    right = spark.createDataFrame([("a", 2)], "k string, w long")
    monkeypatch.setattr(
        type(spark.range(1)),
        "first",
        lambda self: (_ for _ in ()).throw(
            AssertionError("forced strategy ran the diagnostic")
        ),
    )
    skew_aware_join(left, right, ["k"], strategy="plain")
    assert S.last_skew_route() == S.SkewRoute("forced", "plain")
    skew_aware_join(left, right, ["k"], strategy="salted", salt_buckets=3)
    assert S.last_skew_route() == S.SkewRoute(
        "forced", "salted", salt_buckets=3
    )
    with pytest.raises(ValueError, match="strategy"):
        skew_aware_join(left, right, ["k"], strategy="bogus")


def test_streaming_input_stays_lazy(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(
        type(spark.range(1)),
        "first",
        lambda self: (_ for _ in ()).throw(
            AssertionError("policy ran an action on a stream")
        ),
    )
    sdir = str(tmp_path / "skewstream")
    spark.createDataFrame([("a", 1)], "k string, v long").write.parquet(sdir)
    stream = spark.readStream.schema("k string, v long").parquet(sdir)
    right = spark.createDataFrame([("a", 2)], "k string, w long")
    out = skew_aware_join(stream, right, ["k"])
    assert out.isStreaming
    assert S.last_skew_route() == S.SkewRoute("streaming", "plain")


def test_catalog_stats_prove_near_unique_plain_without_a_job(
    spark, monkeypatch
):
    tname = "skew_stats_tbl"
    prior = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.createDataFrame(
        [(i, float(i)) for i in range(400)], "k long, v double"
    ).write.mode("overwrite").saveAsTable(tname)
    spark.sql(f"ANALYZE TABLE {tname} COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.catalog.refreshTable(tname)
    try:
        df = spark.table(tname)
        bound = S._stats_unique_bound(df, ["k"])
        assert bound is not None and 1 <= bound <= 5
        # a filtered plan rescales stats: no longer a bound
        assert S._stats_unique_bound(df.filter("v > 1"), ["k"]) is None
        monkeypatch.setattr(
            type(spark.range(1)),
            "first",
            lambda self: (_ for _ in ()).throw(
                AssertionError("stats path ran the diagnostic job")
            ),
        )
        right = spark.createDataFrame([(1, "x")], "k long, tag string")
        skew_aware_join(df, right, ["k"])
        route = S.last_skew_route()
        assert route.source == "stats" and route.strategy == "plain"
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prior)
        spark.sql(f"DROP TABLE IF EXISTS {tname}")


def test_registered_query_routes_salted(spark, sf_dir):
    """r81's fact side (5 uniform event types on 32 reducers) is the
    honest hot-key shape: the policy must detect it and salt."""
    from eeg_data_lake_spark.workload import REGISTRY

    S._SKEW_CACHE.clear()
    df = REGISTRY["r81_skew_aware_hot_key_join"].spark_fn(spark, sf_dir)
    route = S.last_skew_route()
    assert route.source == "diagnostic" and route.strategy == "salted"
    assert df.count() > 0
