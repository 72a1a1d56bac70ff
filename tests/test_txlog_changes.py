"""TxTable.changes(): the incremental-consumer change feed. Appends
surface as inserted rows tagged with their commit version, compaction
is transparent (pure physical rewrite), rewrite commits raise unless
explicitly skipped, and idempotent txn replay never duplicates feed
rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable(spark, str(tmp_path / "tbl"))


def test_appends_feed_tagged_rows(spark, table):
    v0 = table.append(_df(spark, 0, 5))
    v1 = table.append(_df(spark, 5, 8))
    v2 = table.append(_df(spark, 8, 10))
    feed = table.changes(since=v0)
    assert feed.count() == 5  # versions v1 + v2 only
    by_ver = {
        r["_commit_version"]: r["n"]
        for r in feed.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()
    }
    assert by_ver == {v1: 3, v2: 2}
    # bounded range
    assert table.changes(since=v0, to=v1).count() == 3


def test_empty_range_yields_empty_frame_with_schema(spark, table):
    v = table.append(_df(spark, 0, 4))
    feed = table.changes(since=v)
    assert feed.count() == 0
    assert set(feed.columns) == {"k", "v", "_commit_version"}


def test_compaction_is_transparent(spark, table):
    v0 = table.append(_df(spark, 0, 5))
    table.append(_df(spark, 5, 8))
    before = table.changes(since=v0).orderBy("k").collect()
    table.compact()
    after = table.changes(since=v0).orderBy("k").collect()
    assert before == after


def test_rewrites_raise_unless_skipped(spark, table):
    v0 = table.append(_df(spark, 0, 5))
    table.upsert(_df(spark, 3, 6), keys=["k"])
    with pytest.raises(ValueError, match="upsert"):
        table.changes(since=v0)
    assert table.changes(since=v0, ignore_rewrites=True).count() == 0
    v2 = table.version()
    table.append(_df(spark, 20, 22))
    assert table.changes(since=v2, ignore_rewrites=True).count() == 2


def test_txn_replay_does_not_duplicate_feed(spark, table):
    v0 = table.append(_df(spark, 0, 5))
    table.append(_df(spark, 5, 8), txn_id="batch-1")
    table.append(_df(spark, 5, 8), txn_id="batch-1")  # crash replay
    assert table.changes(since=v0).count() == 3


def test_future_version_rejected(spark, table):
    table.append(_df(spark, 0, 3))
    with pytest.raises(ValueError, match="does not exist"):
        table.changes(since=0, to=99)


def test_cdc_gold_maintenance_equals_batch(spark, tmp_path):
    """Appends land in a source txlog table; a CDC consumer folds each
    batch of changes into a gold aggregate. After any sequence of
    appends (and a crash-replay), gold == one-shot aggregate."""
    from eeg_data_lake_spark.streaming.incremental import (
        maintain_gold_from_changes,
    )

    source = TxTable(spark, str(tmp_path / "src"))
    gold = TxTable(spark, str(tmp_path / "gold"))

    def partial(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    hwm = source.version()
    for lo, hi in [(0, 5), (3, 9), (9, 12)]:  # overlapping keys on purpose
        source.append(
            spark.range(lo, hi).select(
                (F.col("id") % 4).alias("k"), (F.col("id") * 10).alias("v")
            )
        )
        hwm = maintain_gold_from_changes(source, gold, ["k"], partial, hwm)

    # crash replay: consumer re-runs with a STALE high-water mark
    stale = maintain_gold_from_changes(source, gold, ["k"], partial, hwm - 1)
    assert stale == hwm

    got = {r["k"]: (r["n"], r["sv"]) for r in gold.read().collect()}
    want = {
        r["k"]: (r["n"], r["sv"])
        for r in source.read()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == want


def test_zorder_rewrite_is_transparent(spark, table):
    """OPTIMIZE ZORDER rewrites every live file (op 'zorder'); like
    plain compaction it must never re-emit rows into the feed."""
    v0 = table.append(_df(spark, 0, 5))
    table.append(_df(spark, 5, 8))
    before = table.changes(since=v0).orderBy("k").collect()
    table.compact(zorder_by=["k"])
    after = table.changes(since=v0).orderBy("k").collect()
    assert before == after


def test_schema_evolved_commits_stay_feed_readable(spark, table):
    """An additively-evolved append (extra column) must not break the
    feed: older commits read the new column as NULL."""
    v0 = table.version()
    table.append(_df(spark, 0, 3))
    table.append(
        spark.range(3, 5).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.lit("x").alias("extra"),
        )
    )
    feed = table.changes(since=v0)
    assert feed.count() == 5
    assert "extra" in feed.columns
    assert feed.filter(F.col("extra").isNull()).count() == 3


def test_cdc_replay_with_source_advanced_between(spark, tmp_path):
    """THE crash window: gold committed for (since, v], high-water mark
    not persisted, source receives another append, consumer re-runs
    with the stale mark. Per-version txn ids must no-op the replayed
    versions and still apply the new one — never double-count."""
    from eeg_data_lake_spark.streaming.incremental import (
        maintain_gold_from_changes,
    )

    source = TxTable(spark, str(tmp_path / "src"))
    gold = TxTable(spark, str(tmp_path / "gold"))

    def partial(df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    hwm0 = source.version()
    source.append(_df(spark, 0, 5))
    # consumer applies version 0 but CRASHES before persisting hwm
    maintain_gold_from_changes(source, gold, ["k"], partial, hwm0)
    # source advances meanwhile
    source.append(_df(spark, 5, 8))
    # rerun with the STALE mark: v0 must no-op, v1 must apply
    hwm = maintain_gold_from_changes(source, gold, ["k"], partial, hwm0)
    assert hwm == source.version()
    got = {r["k"]: (r["n"], r["sv"]) for r in gold.read().collect()}
    want = {
        r["k"]: (r["n"], r["sv"])
        for r in source.read()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert got == want


def test_vacuumed_feed_range_raises_feed_error(spark, table):
    """After compact()+vacuum() the original add-files of old appends
    are gone; a feed read over that range must fail with the
    change-feed message, not a raw parquet missing-path error."""
    v0 = table.append(_df(spark, 0, 5))
    table.append(_df(spark, 5, 8))
    table.compact()
    table.vacuum()
    with pytest.raises(ValueError, match="vacuumed.*re-sync from a full read"):
        table.changes(since=v0 - 1).count()
    # post-vacuum appends remain feed-readable
    v_new = table.append(_df(spark, 8, 10))
    assert table.changes(since=v_new - 1).count() == 2
