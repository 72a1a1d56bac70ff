"""HLL sketch rollup: the two-level (daily partial → union) estimate
must stay within HLL's documented error of the exact distinct count,
and the partial-union path must equal a direct one-level sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from eeg_data_lake_spark.workload.registry import REGISTRY


def test_rollup_estimate_close_to_exact(spark, sf_dir):
    got = {
        r.event_type: r.approx_users
        for r in REGISTRY["z01_hll_sketch_rollup"].spark_fn(spark, sf_dir).collect()
    }
    from eeg_data_lake_spark.sources.readers import read_testdata

    exact = {
        r.event_type: r.n
        for r in read_testdata(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        # default lgConfigK=12 → relative error ~1.6%; allow 5% + slack 2
        assert abs(got[k] - n) <= max(0.05 * n, 2), (k, got[k], n)


def test_union_of_partials_equals_direct_sketch(spark, sf_dir):
    from eeg_data_lake_spark.sources.readers import read_testdata

    e = read_testdata(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    via_partials = (
        e.groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    a = {r.event_type: r.est for r in via_partials.collect()}
    b = {r.event_type: r.est for r in direct.collect()}
    assert a == b  # merge must be lossless, not approximately equal


def test_cms_never_underestimates_and_is_mergeable(spark, sf_dir):
    """CMS guarantee: est >= exact for every probed token; and the
    (d, bucket) cell table built from two half-corpora summed cell-wise
    equals the one-shot sketch (the merge property the 100 TB rollup
    relies on)."""
    rows = REGISTRY["z05_cms_heavy_hitters"].spark_fn(spark, sf_dir).collect()
    assert rows, "expected candidate tokens"
    for r in rows:
        assert r.cms_est >= r.exact_cnt, (r.tok, r.cms_est, r.exact_cnt)

    from eeg_data_lake_spark.sources.readers import read_testdata
    from eeg_data_lake_spark.workload.analytics import cms_probe_col

    docs = read_testdata(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )

    def cells(df):
        # same probe expression as z05's sketch build, by construction
        probes = df.select(
            F.explode(cms_probe_col(F.col("tok"))).alias("p")
        ).select("p.d", "p.bucket")
        return probes.groupBy("d", "bucket").agg(F.count("*").alias("bc"))

    direct = cells(tok)
    half_a = cells(tok.filter(F.col("doc_id") % 2 == 0))
    half_b = cells(tok.filter(F.col("doc_id") % 2 == 1))
    merged = (
        half_a.unionByName(half_b)
        .groupBy("d", "bucket")
        .agg(F.sum("bc").alias("bc"))
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_z14_rolling_hll_tracks_exact_wau(spark, sf_dir):
    """The sketch-rollup WAU curve must track the exact r14 curve
    within HLL error on every day (default lgConfigK=12 → ~1.6% rse;
    gate at 5% or ±2 users for tiny days)."""
    from eeg_data_lake_spark.workload import REGISTRY

    exact = {
        str(r.day): r.wau
        for r in REGISTRY["r14_rolling_distinct_users"].spark_fn(spark, sf_dir).collect()
    }
    approx = {
        str(r.day): r.approx_wau
        for r in REGISTRY["z14_rolling_hll_wau"].spark_fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.05 * n), (day, approx[day], n)
