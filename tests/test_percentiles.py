"""exact_percentiles must reproduce the builtin `percentile`
aggregate's linear interpolation (within float association noise) on
adversarial shapes: single-row groups, all-equal values, heavy
duplication, and boundary quantiles p=0 / p=1."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.percentiles import exact_percentiles

PS = [0.0, 0.25, 0.5, 0.95, 1.0]


def _ref(df, ps):
    aggs = [
        F.expr(f"percentile(v, {p})").alias(f"p{int(round(p * 100))}") for p in ps
    ]
    return {
        r["k"]: r.asDict() for r in df.groupBy("k").agg(*aggs).collect()
    }


def _new(df, ps):
    return {
        r["k"]: r.asDict()
        for r in exact_percentiles(df, "k", "v", ps).collect()
    }


@pytest.mark.parametrize(
    "rows",
    [
        # single-row group + two-row group
        [("a", 7.0), ("b", 1.0), ("b", 3.0)],
        # all-equal values
        [("a", 5.0)] * 10,
        # heavy duplication across 3 groups
        [(k, float(v)) for k in "abc" for v in [1, 1, 1, 2, 2, 9, 9, 9, 9, 100]],
    ],
)
def test_matches_builtin_percentile(spark, rows):
    df = spark.createDataFrame(rows, "k string, v double")
    ref, new = _ref(df, PS), _new(df, PS)
    assert set(ref) == set(new)
    for k in ref:
        for p in PS:
            col = f"p{int(round(p * 100))}"
            assert new[k][col] == pytest.approx(ref[k][col], abs=1e-9), (k, col)


def test_matches_builtin_on_random_data(spark):
    rng = random.Random(7)
    rows = [
        (rng.choice("abcd"), round(rng.uniform(-100, 100), 2))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    ref, new = _ref(df, PS), _new(df, PS)
    for k in ref:
        for p in PS:
            col = f"p{int(round(p * 100))}"
            assert new[k][col] == pytest.approx(ref[k][col], abs=1e-9), (k, col)


def test_property_matches_numpy_linear_quantile(spark):
    """Hypothesis: for any value multiset, exact_percentiles equals
    numpy's 'linear' quantile (the same k=(n-1)p interpolation)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1,
            max_size=60,
        ),
        p=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
    )
    def check(vals, p):
        df = spark.createDataFrame([("g", float(v)) for v in vals], "k string, v double")
        got = exact_percentiles(df, "k", "v", [p]).collect()[0][1]
        want = float(np.quantile(np.array(vals, dtype="float64"), p, method="linear"))
        assert got == pytest.approx(want, rel=1e-9, abs=1e-9)

    check()


def test_nulls_are_ignored_like_builtin(spark):
    """percentile() skips NULLs; the rank plan must too — NULLs neither
    occupy ranks nor inflate the group count."""
    rows = [("a", None), ("a", 1.0), ("a", 2.0), ("b", None), ("b", 7.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in exact_percentiles(df, "k", "v", [0.0, 0.5]).collect()}
    ref = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.expr("percentile(v, 0.0)").alias("p0"),
            F.expr("percentile(v, 0.5)").alias("p50"),
        )
        .collect()
    }
    for k in ref:
        assert got[k]["p0"] == pytest.approx(ref[k]["p0"], abs=1e-9)
        assert got[k]["p50"] == pytest.approx(ref[k]["p50"], abs=1e-9)


def test_validates_arguments():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError, match="at least one"):
        exact_percentiles(None, "k", "v", [])
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_percentiles(None, "k", "v", [1.5])


def test_fractional_percentiles_get_distinct_names(spark):
    df = spark.createDataFrame([("a", float(i)) for i in range(9)], "k string, v double")
    out = exact_percentiles(df, "k", "v", [0.12, 0.125])
    assert out.columns == ["k", "p12", "p12_5"]


def test_all_null_group_survives_with_null_percentile(spark):
    """A group whose values are ALL NULL still appears in percentile()'s
    output (with NULL quantiles) — the rank plan must not drop it."""
    rows = [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r for r in exact_percentiles(df, "k", "v", [0.5]).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["p50"] == pytest.approx(2.0)
    assert got["b"]["p50"] is None


def test_null_group_key_is_a_legal_group(spark):
    """NULL is a valid GROUP BY key: the builtin aggregates it like
    any other group, so the rank plan's key re-attachment must be
    null-SAFE or the NULL group's percentiles silently vanish."""
    rows = [(None, 1.0), (None, 3.0), ("a", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: r["p50"] for r in exact_percentiles(df, "k", "v", [0.5]).collect()}
    assert got == {None: pytest.approx(2.0), "a": pytest.approx(5.0)}


def test_with_min_max_rides_the_same_relation(spark):
    df = spark.createDataFrame(
        [("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", None), ("b", None), ("c", 5.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r
        for r in exact_percentiles(
            df, "k", "v", [0.5], with_min_max=True
        ).collect()
    }
    assert (got["a"]["vmin"], got["a"]["vmax"], got["a"]["p50"]) == (1.0, 3.0, 2.0)
    # all-NULL group keeps its row with NULL min/max, like builtin agg
    assert (got["b"]["vmin"], got["b"]["vmax"], got["b"]["p50"]) == (None, None, None)
    assert (got["c"]["vmin"], got["c"]["vmax"]) == (5.0, 5.0)


def test_value_buckets_is_bit_identical_and_handles_edges(spark):
    """The bucketed two-level cumulation must reproduce the single-
    window form exactly — same integer count sums, same interpolation
    — including NULL keys, all-NULL-value groups, heavy duplication
    (all rows in one bucket), and constant values (degenerate
    boundaries)."""
    import random

    rng = random.Random(3)
    rows = []
    for k in ["a", "b", None]:
        rows += [(k, float(rng.randint(0, 40))) for _ in range(200)]
    rows += [("const", 7.0)] * 50          # constant value column
    rows += [("nulls", None)] * 5          # all-NULL group
    rows += [("single", 3.25)]             # one-row group
    df = spark.createDataFrame(rows, "k string, v double")
    ps = [0.0, 0.25, 0.5, 0.95, 1.0]
    plain = {
        r["k"]: tuple(r)[1:]
        for r in exact_percentiles(df, "k", "v", ps, with_min_max=True).collect()
    }
    for nb in (2, 8, 64):
        bucketed = {
            r["k"]: tuple(r)[1:]
            for r in exact_percentiles(
                df, "k", "v", ps, with_min_max=True, value_buckets=nb
            ).collect()
        }
        assert bucketed == plain, nb


def test_bucketed_route_plan_has_no_keyset_join(spark):
    """r11 pin: the bucketed (at-scale) route ranks the UNFILTERED
    grouped relation null-aware, so the only join left in its plan is
    the tiny broadcast offsets attach — the key-set distinct + null-
    safe LEFT join the r10 branch still paid must stay gone."""
    rows = [("a", 1.0), ("a", None), ("b", None), (None, 2.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = exact_percentiles(df, "k", "v", [0.5], value_buckets=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    joins = [
        ln for ln in plan.splitlines() if "Join" in ln and "join" not in ln
    ]
    # exactly the one BroadcastHashJoin/BNLJ attaching bucket offsets;
    # no LeftOuter key-set re-attachment anywhere
    assert len(joins) == 1, plan
    assert "LeftOuter" not in plan, plan


def test_auto_policy_selects_by_per_key_distinct_estimate(spark, monkeypatch):
    """The "auto" default routes through _auto_value_buckets: small
    inputs take the single-window cumulation (no bucketed call),
    inputs whose largest key exceeds the threshold take the bucketed
    one at the session shuffle-partition count — and both give the
    same rows. Explicit None / int skip the estimator entirely."""
    from eeg_data_lake_spark.operators import percentiles as P

    calls = []
    real = P._bucketed_cumulative

    def spy(pc, key, value, n_buckets):
        calls.append(n_buckets)
        return real(pc, key, value, n_buckets)

    monkeypatch.setattr(P, "_bucketed_cumulative", spy)

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(500)] + [("b", 7.0)],
        "k string, v double",
    )
    small = exact_percentiles(df, "k", "v", [0.5]).collect()
    assert calls == []  # 500 distincts < threshold → single-window

    wide = exact_percentiles(
        df, "k", "v", [0.5], auto_bucket_threshold=100
    ).collect()
    expected_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert calls == [expected_n]  # 500 > 100 → bucketed at session width
    assert sorted(map(tuple, small)) == sorted(map(tuple, wide))

    # explicit selections never pay the estimator pre-pass
    jobs = []
    monkeypatch.setattr(
        P, "_auto_value_buckets",
        lambda *a, **k: jobs.append(1) or None,
    )
    exact_percentiles(df, "k", "v", [0.5], value_buckets=None).collect()
    exact_percentiles(df, "k", "v", [0.5], value_buckets=2).collect()
    assert jobs == []

    with pytest.raises(ValueError, match="value_buckets"):
        exact_percentiles(df, "k", "v", [0.5], value_buckets="bogus")


def test_auto_estimator_handles_empty_and_all_null(spark):
    """The estimator's max-over-keys is NULL on empty / all-NULL-value
    input; auto must fall back to single-window without erroring."""
    empty = spark.createDataFrame([], "k string, v double")
    assert exact_percentiles(empty, "k", "v", [0.5]).collect() == []
    nulls = spark.createDataFrame([("a", None)], "k string, v double")
    rows = exact_percentiles(nulls, "k", "v", [0.5]).collect()
    assert len(rows) == 1 and rows[0][1] is None


def test_auto_policy_routes_from_catalog_stats_without_a_job(
    spark, monkeypatch
):
    """With ANALYZEd catalog column stats visible to the planner
    (spark.sql.cbo.enabled), the "auto" policy must
    route WITHOUT running the HLL pre-pass action — at 100 TB the
    pre-pass is a full extra scan of the value column, and the
    catalog already knows the answer. DataFrame.first (the pre-pass's
    only action) is patched to explode, so any job attempt fails the
    test; routing decisions must match the estimator's."""
    from eeg_data_lake_spark.operators import percentiles as P

    tname = "pct_stats_tbl"
    prior = spark.conf.get("spark.sql.cbo.enabled", "false")
    # cbo.enabled is what propagates ANALYZE stats into plan
    # statistics on this Spark version (planStats.enabled alone does
    # not, probed); refreshTable drops the session's cached relation,
    # whose plan stats were memoized under the old conf
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.createDataFrame(
        [("a", float(v)) for v in range(400)] + [("b", 7.0)],
        "k string, v double",
    ).write.mode("overwrite").saveAsTable(tname)
    spark.sql(f"ANALYZE TABLE {tname} COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.catalog.refreshTable(tname)
    try:
        df = spark.table(tname)
        bound, is_ndv = P._stats_distinct_bound(df, "v")
        assert is_ndv and bound is not None and 400 <= bound <= 402
        # case-insensitive resolution, like the rest of the operator
        bound_uc, is_ndv_uc = P._stats_distinct_bound(df, "V")
        assert (bound_uc, is_ndv_uc) == (bound, is_ndv)
        # a FILTERED plan re-scales stats by estimated selectivity --
        # no longer an upper bound, so the fast path must bail
        assert P._stats_distinct_bound(df.filter("v > 1"), "v") == (
            None,
            False,
        )

        P._AUTO_CACHE.clear()
        # patch the CONCRETE class instances actually carry (Spark 4:
        # pyspark.sql.classic), else the patch never intercepts and
        # the no-job assertions are vacuous
        monkeypatch.setattr(
            type(spark.range(1)),
            "first",
            lambda self: (_ for _ in ()).throw(
                AssertionError("auto policy ran the pre-pass job")
            ),
        )
        # below threshold -> single-window, decided from stats alone
        route = P._auto_value_buckets(df, "k", "v", 1000)
        assert route.value_buckets is None and route.source == "stats"
        # above threshold -> bucketed at session width, still no job
        # (the bound came from the column's ndv, tight enough to route)
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
        route = P._auto_value_buckets(df, "k", "v", 100)
        assert route.value_buckets == width and route.source == "stats"
        # the repeat is a memo hit, observable as such
        assert P._auto_value_buckets(df, "k", "v", 100).source == "memo" 
        # rowCount-only bound ABOVE the threshold must NOT route
        # bucketed -- it says nothing about distincts; the policy
        # falls through to the pre-pass (which here explodes loudly)
        P._AUTO_CACHE.clear()
        monkeypatch.setattr(
            P, "_stats_distinct_bound", lambda df, v: (401, False)
        )
        with pytest.raises(AssertionError, match="pre-pass"):
            P._auto_value_buckets(df, "k", "v", 100)
        # ...while the same loose bound below threshold short-circuits
        assert P._auto_value_buckets(df, "k", "v", 1000).value_buckets is None
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prior)
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        P._AUTO_CACHE.clear()


def test_auto_policy_streaming_input_stays_lazy(spark, tmp_path, monkeypatch):
    """A streaming DataFrame must route single-window WITHOUT any
    eager action (the estimator's .first() would raise
    AnalysisException on a stream)."""
    from eeg_data_lake_spark.operators import percentiles as P

    monkeypatch.setattr(
        type(spark.range(1)),
        "first",
        lambda self: (_ for _ in ()).throw(
            AssertionError("auto policy ran an action on a stream")
        ),
    )
    sdir = str(tmp_path / "pctstream")
    spark.createDataFrame(
        [("a", 1.0)], "k string, v double"
    ).write.parquet(sdir)
    stream = spark.readStream.schema("k string, v double").parquet(sdir)
    assert stream.isStreaming
    route = P._auto_value_buckets(stream, "k", "v", 100)
    assert route.value_buckets is None and route.source == "streaming"


def test_auto_cache_evicts_oldest_not_everything(monkeypatch):
    """On overflow the memo cache drops ONE oldest entry, keeping the
    warm remainder (round-8 ADVICE: clear() threw away every warm
    routing decision at once)."""
    from eeg_data_lake_spark.operators import percentiles as P

    monkeypatch.setattr(P, "_AUTO_CACHE_MAX", 3)
    monkeypatch.setattr(P, "_AUTO_CACHE", {})
    monkeypatch.setattr(P, "_stats_distinct_bound", lambda df, v: (1, True))

    class FakeDF:
        isStreaming = False

    for i in range(3):
        monkeypatch.setattr(P, "_plan_key", lambda df, i=i: i)
        P._auto_value_buckets(FakeDF(), "k", "v", 100)
    assert sorted(k[0] for k in P._AUTO_CACHE) == [0, 1, 2]
    monkeypatch.setattr(P, "_plan_key", lambda df: 3)
    P._auto_value_buckets(FakeDF(), "k", "v", 100)
    assert sorted(k[0] for k in P._AUTO_CACHE) == [1, 2, 3]


def test_last_route_reports_each_path(spark):
    """Every exact_percentiles call records its routing decision where
    the caller can read it (last_route): at 100 TB an operator that
    silently chose the single-task window is a debugging trap. The
    stats / streaming / memo paths are asserted in their dedicated
    tests above; this covers the public-API surface for the forced
    and pre-pass paths plus the decision fields."""
    from eeg_data_lake_spark.operators import percentiles as P

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(50)], "k string, v double"
    )
    # explicit selections record "forced" with the given decision
    exact_percentiles(df, "k", "v", [0.5], value_buckets=None)
    assert P.last_route() == P.PercentileRoute("forced", None)
    exact_percentiles(df, "k", "v", [0.5], value_buckets=4)
    assert P.last_route() == P.PercentileRoute("forced", 4)
    # a bare createDataFrame plan has no catalog stats: auto runs the
    # HLL pre-pass and records its evidence (~50 distincts) and the
    # single-window decision
    P._AUTO_CACHE.clear()
    exact_percentiles(df, "k", "v", [0.5])
    route = P.last_route()
    assert route.source == "prepass"
    assert route.value_buckets is None
    assert 45 <= route.bound <= 55
    # above-threshold pre-pass routes bucketed and says so
    P._AUTO_CACHE.clear()
    exact_percentiles(df, "k", "v", [0.5], auto_bucket_threshold=10)
    route = P.last_route()
    assert route.source == "prepass"
    assert route.value_buckets == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
