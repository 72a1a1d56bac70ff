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


def _cnt(calls):
    def compute(df):
        calls.append(1)
        return df.groupBy().agg(F.count(F.lit(1)).alias("n"), F.lit(0.0).alias("total"))

    return compute


def test_two_tags_share_cache_without_bleed(spark, tables):
    src, cache = tables
    calls_a: list[int] = []
    calls_b: list[int] = []
    a = cached_result(src, cache, _agg(calls_a), "a").collect()
    b = cached_result(src, cache, _cnt(calls_b), "b").collect()
    # each tag sees ONLY its own single row, not the union
    assert len(a) == 1 and len(b) == 1
    assert a[0].total == 30.0 and b[0].total == 0.0
    # serving again hits the per-tag cache
    a2 = cached_result(src, cache, _agg(calls_a), "a").collect()
    b2 = cached_result(src, cache, _cnt(calls_b), "b").collect()
    assert len(calls_a) == 1 and len(calls_b) == 1
    assert a2 == a and b2 == b


def test_vacuum_one_tag_preserves_other_tags(spark, tables):
    src, cache = tables
    calls_a: list[int] = []
    calls_b: list[int] = []
    cached_result(src, cache, _agg(calls_a), "a")
    cached_result(src, cache, _cnt(calls_b), "b")
    src.append(spark.createDataFrame([(3, 30.0)], "k long, v double"))
    cached_result(src, cache, _agg(calls_a), "a")
    cached_result(src, cache, _cnt(calls_b), "b")
    n = vacuum_cache(cache, "a", keep_versions=1)
    assert n == 1
    # tag b's rows (both versions) survive a's vacuum and serve cached
    before = len(calls_b)
    out = cached_result(src, cache, _cnt(calls_b), "b").collect()
    assert len(calls_b) == before and out[0].n == 3


def test_vacuumed_version_recomputes_not_empty(spark, tables):
    src, cache = tables
    calls: list[int] = []
    first = cached_result(src, cache, _agg(calls), "a").collect()
    # drop EVERYTHING for tag a; manifests alone would still claim cached
    assert vacuum_cache(cache, "a", keep_versions=0) == 0
    out = cached_result(src, cache, _agg(calls), "a").collect()
    assert len(calls) == 2  # recomputed, did NOT serve an empty result
    assert out == first


def test_prefix_tags_do_not_collide(spark, tables):
    """Tag 'a' vs tag 'ag1' (one a prefix of the other): commits must
    attribute to exactly one tag — a prefix-based parse would credit
    'ag1' commits to 'a' and serve tag 'a' an empty cached result."""
    src, cache = tables
    calls_a: list[int] = []
    calls_p: list[int] = []
    b = cached_result(src, cache, _cnt(calls_p), "ag1").collect()
    a = cached_result(src, cache, _agg(calls_a), "a").collect()
    assert len(calls_a) == 1  # 'a' computed its OWN result, not served b's
    assert a[0].total == 30.0 and b[0].total == 0.0
    # vacuum of the longer tag leaves the shorter tag served & intact
    vacuum_cache(cache, "ag1", keep_versions=1)
    before = len(calls_a)
    assert cached_result(src, cache, _agg(calls_a), "a").collect() == a
    assert len(calls_a) == before


def test_dashed_tags_rejected(spark, tables):
    """'-' is the txn-id field separator: a tag like 'a-g7' would make
    a LEGACY id 'rc-a-g7-v3' (tag 'a-g7' at v3) indistinguishable from
    the current format's (tag 'a', gen 7, v3) misclaim — so dashed
    tags are refused at every entry point instead of parsed wrongly at
    migration time."""
    src, cache = tables
    with pytest.raises(ValueError, match="no '-'"):
        cached_result(src, cache, lambda df: df, "a-g7")
    with pytest.raises(ValueError, match="no '-'"):
        vacuum_cache(cache, "a-g1")
    with pytest.raises(ValueError, match="non-empty"):
        cached_result(src, cache, lambda df: df, "")


def test_empty_source_refused(spark, tmp_path):
    src = TxTable(spark, str(tmp_path / "s2"))
    cache = TxTable(spark, str(tmp_path / "c2"))
    with pytest.raises(ValueError, match="no data"):
        cached_result(src, cache, lambda df: df, "x")


def test_legacy_pre_tag_cache_table_upgrades_cleanly(spark, tables):
    """A cache table written by the pre-_cache_tag format (rows without
    the tag column, txn ids 'rc-{tag}-v{v}') must neither break reads
    (mixed parquet schemas) nor be served as a claim: the query
    recomputes once under the new format, legacy rows stay invisible,
    and the first vacuum reclaims them."""
    src, cache = tables
    # simulate the legacy writer: no _cache_tag column, old txn format
    legacy = (
        src.read()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .withColumn("_source_version", F.lit(0).cast("long"))
    )
    cache.append(legacy, txn_id="rc-t1-v0")

    calls: list[int] = []
    out = cached_result(src, cache, _agg(calls), "t1").collect()
    assert len(calls) == 1  # legacy claim ignored -> recomputed
    assert out[0].n == 2 and out[0].total == 30.0
    # served-from-cache on the second call (new-format claim works)
    out2 = cached_result(src, cache, _agg(calls), "t1").collect()
    assert len(calls) == 1 and out2 == out
    # exactly one row visible for the tag (legacy row has NULL tag)
    vis = cache.read(merge_schema=True).filter(F.col("_cache_tag") == "t1")
    assert vis.count() == 1
    # vacuum keeps the tagged row and reclaims the unattributable one
    assert vacuum_cache(cache, "t1", keep_versions=1) == 1
    assert cache.read().count() == 1


def test_legacy_gen_collision_bumps_generation(spark, tables):
    """ADVICE r4: a legacy dashed-tag id that EXACTLY matches the id
    the recompute would use ('rc-a-g0-v0' for tag 'a', gen == n_vac
    == 0, v0) must not replay-skip the recompute's append — the
    generation bumps past every committed id so the rows land and the
    tag is never permanently stuck serving an empty result."""
    src, cache = tables
    legacy = (
        src.read()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .withColumn("_cache_tag", F.lit("a-g0"))
        .withColumn("_source_version", F.lit(0).cast("long"))
    )
    cache.append(legacy, txn_id="rc-a-g0-v0")
    calls: list[int] = []
    out = cached_result(src, cache, _agg(calls), "a").collect()
    assert len(calls) == 1
    assert out[0].n == 2 and out[0].total == 30.0  # NOT empty
    # the bumped-generation claim is durable: next call serves cached
    out2 = cached_result(src, cache, _agg(calls), "a").collect()
    assert len(calls) == 1 and out2 == out


def test_empty_result_cached_without_log_growth(spark, tables):
    """A genuinely empty result recomputes per call (the non-empty
    guard can't distinguish it from a misclaim) but must NOT commit a
    new manifest per call — the collision path detects its own prior
    claim and serves the empty recompute directly."""
    src, cache = tables

    calls: list[int] = []

    def empty(df):
        calls.append(1)
        return df.filter(F.lit(False)).select(
            F.col("k").alias("n"), F.col("v").alias("total")
        )

    a = cached_result(src, cache, empty, "e").collect()
    v_after_first = cache.version()
    b = cached_result(src, cache, empty, "e").collect()
    c = cached_result(src, cache, empty, "e").collect()
    assert a == [] and b == [] and c == []
    assert cache.version() == v_after_first  # no per-call commits


def test_repeated_vacuum_same_floor_actually_drops(spark, tables):
    """ADVICE r4 (medium): vacuum(keep=0) → recompute the sole version
    → vacuum(keep=0) again lands on the SAME floor; without a vacuum
    ordinal in the txn id the second overwrite replay-skips and the
    rows survive while the call reports success."""
    src, cache = tables
    calls: list[int] = []
    cached_result(src, cache, _agg(calls), "a")
    assert vacuum_cache(cache, "a", keep_versions=0) == 0
    cached_result(src, cache, _agg(calls), "a")  # re-add same version
    assert len(calls) == 2
    # second vacuum computes the same floor; must actually drop
    assert vacuum_cache(cache, "a", keep_versions=0) == 0
    assert (
        cache.read(merge_schema=True)
        .filter(F.col("_cache_tag") == "a")
        .count()
        == 0
    )
    # and the tag still recomputes correctly afterwards
    out = cached_result(src, cache, _agg(calls), "a").collect()
    assert len(calls) == 3 and out[0].total == 30.0


def test_legacy_dashed_tag_misclaim_recomputes_not_empty(spark, tables):
    """A legacy-format commit for old dashed tag 'a-g7' ('rc-a-g7-v0')
    grammatically parses as a current-format claim for tag 'a' at v0.
    Serving it blindly would return an EMPTY result; the non-empty
    verification must fall through to recompute instead."""
    src, cache = tables
    legacy = (
        src.read()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .withColumn("_cache_tag", F.lit("a-g7"))
        .withColumn("_source_version", F.lit(0).cast("long"))
    )
    cache.append(legacy, txn_id="rc-a-g7-v0")
    calls: list[int] = []
    out = cached_result(src, cache, _agg(calls), "a").collect()
    assert len(calls) == 1                       # recomputed
    assert out[0].n == 2 and out[0].total == 30.0
    # second call serves the now-real rows without recomputing
    out2 = cached_result(src, cache, _agg(calls), "a").collect()
    assert len(calls) == 1 and out2 == out
