"""Incremental JOIN view maintenance: equivalence with the full join
at every step, exactly-once under replay, Δleft⋈Δright counted once,
rewrite refusal."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.incremental import (
    _ivm_join_state,
    maintain_join_view,
)


def _rows(df):
    return sorted(map(tuple, df.select("k", "lval", "rval").collect()))


def _full_join(left: TxTable, right: TxTable):
    return left.read().join(right.read(), ["k"])


@pytest.fixture()
def tables(spark, tmp_path):
    left = TxTable(spark, str(tmp_path / "left"))
    right = TxTable(spark, str(tmp_path / "right"))
    sink = TxTable(spark, str(tmp_path / "sink"))
    return left, right, sink


def _df(spark, col, rows):
    return spark.createDataFrame(rows, f"k long, {col} string")


def test_tracks_full_join_across_interleaved_appends(spark, tables):
    left, right, sink = tables
    left.append(_df(spark, "lval", [(1, "a"), (2, "b")]))
    maintain_join_view(left, right, ["k"], sink, "j1")
    # right still empty → nothing to join, sink still schemaless
    with pytest.raises(ValueError):
        sink.read()

    right.append(_df(spark, "rval", [(2, "x"), (3, "y")]))
    maintain_join_view(left, right, ["k"], sink, "j1")
    assert _rows(sink.read()) == _rows(_full_join(left, right))
    assert _ivm_join_state(sink, "j1") == (0, 0)

    # grow both sides, including a key that is new on BOTH (Δ⋈Δ)
    left.append(_df(spark, "lval", [(3, "c"), (4, "d")]))
    right.append(_df(spark, "rval", [(1, "z"), (4, "w")]))
    maintain_join_view(left, right, ["k"], sink, "j1")
    want = _rows(_full_join(left, right))
    assert _rows(sink.read()) == want
    # (4, d, w) is the Δleft⋈Δright row — present exactly once
    assert want.count((4, "d", "w")) == 1
    assert _rows(sink.read()).count((4, "d", "w")) == 1


def test_replay_is_noop(spark, tables):
    left, right, sink = tables
    left.append(_df(spark, "lval", [(1, "a")]))
    right.append(_df(spark, "rval", [(1, "x")]))
    maintain_join_view(left, right, ["k"], sink, "j2")
    v = sink.version()
    before = _rows(sink.read())
    # no new source commits → nothing applied
    maintain_join_view(left, right, ["k"], sink, "j2")
    assert sink.version() == v
    assert _rows(sink.read()) == before


def test_crash_replay_from_stale_external_state(spark, tables):
    """The recovery contract: state comes from the sink log, so even a
    caller that lost its return value (crash before persisting) just
    calls maintain again and the already-applied steps no-op while new
    source commits still apply."""
    left, right, sink = tables
    left.append(_df(spark, "lval", [(1, "a"), (2, "b")]))
    right.append(_df(spark, "rval", [(1, "x")]))
    maintain_join_view(left, right, ["k"], sink, "j3")
    # 'crash': caller forgot everything; sources advanced meanwhile
    right.append(_df(spark, "rval", [(2, "y")]))
    maintain_join_view(left, right, ["k"], sink, "j3")
    maintain_join_view(left, right, ["k"], sink, "j3")  # and again
    assert _rows(sink.read()) == _rows(_full_join(left, right))


def test_empty_delta_steps_still_advance_state(spark, tables):
    left, right, sink = tables
    left.append(_df(spark, "lval", [(1, "a")]))
    right.append(_df(spark, "rval", [(9, "x")]))  # disjoint keys
    maintain_join_view(left, right, ["k"], sink, "j4")
    assert _ivm_join_state(sink, "j4") == (0, 0)
    assert sink.read().count() == 0  # empty join, but schema committed
    left.append(_df(spark, "lval", [(9, "b")]))
    maintain_join_view(left, right, ["k"], sink, "j4")
    assert _rows(sink.read()) == [(9, "b", "x")]


def test_source_rewrite_raises(spark, tables):
    left, right, sink = tables
    left.append(_df(spark, "lval", [(1, "a")]))
    right.append(_df(spark, "rval", [(1, "x")]))
    maintain_join_view(left, right, ["k"], sink, "j5")
    left.overwrite(_df(spark, "lval", [(1, "A")]))
    with pytest.raises(ValueError, match="rewrite|overwrite"):
        maintain_join_view(left, right, ["k"], sink, "j5")
