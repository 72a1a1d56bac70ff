"""RESTORE (roll back by rolling forward) and CLONE (zero-copy
snapshot materialization) on the txlog: restore reproduces the target
snapshot bit-for-bit while preserving history, refuses vacuumed
targets, and counts as a logical rewrite for the change feed; clones
are independent tables sharing bytes via hardlinks — either side can
rewrite and vacuum without corrupting the other."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.sources.txlog import TxTable, table_history


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _mk(spark, tmp_path, name="t"):
    t = TxTable(spark, str(tmp_path / name))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    return t


def test_restore_reproduces_snapshot_and_preserves_history(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    v1_rows = _rows(t.read(version=1))
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))

    v = t.restore(1)
    assert v == t.version() == 3
    assert _rows(t.read()) == v1_rows == {(1, "a"), (2, "b"), (3, "c")}
    # history preserved: the pre-restore overwrite is still time-
    # travelable, and the restore shows up as its own commit
    assert _rows(t.read(version=2)) == {(9, "z")}
    ops = [r.op for r in table_history(t).collect()]
    assert "restore" in ops
    # a bad restore is undone by restoring again (roll-forward model)
    t.restore(2)
    assert _rows(t.read()) == {(9, "z")}


def test_restore_to_current_content_is_a_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.version()
    assert t.restore(v) == v
    assert t.version() == v  # nothing committed


def test_restore_is_a_logical_rewrite_for_the_change_feed(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    t.restore(1)
    # since=2 puts ONLY the restore in range: the refusal is its own,
    # not the prior overwrite's
    with pytest.raises(ValueError, match="restore"):
        t.changes(since=2)
    # ignore_rewrites skips it, documented-lossy, like overwrite
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    got = _rows(
        t.changes(since=1, ignore_rewrites=True).drop("_commit_version")
    )
    assert got == {(4, "d")}


def test_restore_refuses_vacuumed_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    t.vacuum(keep_versions=0)  # drops v0/v1's files
    with pytest.raises(ValueError, match="vacuumed"):
        t.restore(1)
    # the failed restore committed nothing
    assert t.version() == 2
    assert _rows(t.read()) == {(9, "z")}


def test_restore_idempotent_under_txn_id(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    v = t.restore(1, txn_id="restore-job-7")
    assert t.restore(1, txn_id="restore-job-7") == v  # replay skipped
    assert t.version() == v


def test_clone_matches_snapshot_and_is_independent(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "c"))
    assert c.version() == 0
    assert _rows(c.read()) == _rows(t.read())
    ops = [r.op for r in table_history(c).collect()]
    assert ops == ["clone"]

    # writes to either side are invisible to the other
    c.append(spark.createDataFrame([(7, "g")], "k long, v string"))
    t.append(spark.createDataFrame([(8, "h")], "k long, v string"))
    assert (7, "g") in _rows(c.read()) and (7, "g") not in _rows(t.read())
    assert (8, "h") in _rows(t.read()) and (8, "h") not in _rows(c.read())


def test_clone_survives_source_rewrite_and_vacuum(spark, tmp_path):
    """The hardlink-isolation claim: after the SOURCE overwrites and
    vacuums away every original file, the clone still reads the full
    snapshot — the shared bytes live until both sides drop them (the
    failure mode of a path-referencing shallow clone)."""
    t = _mk(spark, tmp_path)
    want = _rows(t.read())
    c = t.clone_to(str(tmp_path / "c"))
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    t.vacuum(keep_versions=0)
    assert _rows(c.read()) == want
    # and the mirror image: clone rewrite+vacuum leaves source intact
    d = TxTable(spark, str(tmp_path / "t")).clone_to(str(tmp_path / "d"))
    d.overwrite(spark.createDataFrame([(5, "e")], "k long, v string"))
    d.vacuum(keep_versions=0)
    assert _rows(t.read()) == {(9, "z")}


def test_clone_of_old_version(spark, tmp_path):
    t = _mk(spark, tmp_path)
    c = t.clone_to(str(tmp_path / "c"), version=0)
    assert _rows(c.read()) == {(1, "a"), (2, "b")}


def test_clone_refuses_nonempty_destination(spark, tmp_path):
    t = _mk(spark, tmp_path)
    other = TxTable(spark, str(tmp_path / "c"))
    other.append(spark.createDataFrame([(5, "e")], "k long, v string"))
    with pytest.raises(ValueError, match="already has commits"):
        t.clone_to(str(tmp_path / "c"))


def test_restore_invalidates_projection_to_full_rebuild(
    spark, tmp_path
):
    """A restore under a live index projection must never be served
    base+tail (the tail cannot express the implicit deletions):
    index_frames raises, and the maintenance path repairs by full
    re-bucketize from live content."""
    import uuid

    from eeg_data_lake_spark.sources.indexproj import (
        bucketize_index,
        extend_projection,
        index_frames,
        newest_projection,
    )

    base = f"ixr_{uuid.uuid4().hex[:8]}"
    t = TxTable(spark, str(tmp_path / "idx"))
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    try:
        bucketize_index(t, base, ["k"], n_buckets=4)
        t.restore(0)
        with pytest.raises(ValueError):
            index_frames(t, base)
        assert extend_projection(t, base, ["k"]) is None  # declines
        name = bucketize_index(t, base, ["k"], n_buckets=4)
        assert newest_projection(spark, base) == (name, t.version())
        frames = index_frames(t, base)
        assert len(frames) == 1
        assert _rows(frames[0]) == {(1, "a")}
    finally:
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith(base):
                spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")


def test_restore_refuses_to_resurrect_constraint_violations(
    spark, tmp_path
):
    """Review finding: restore re-adds historical files unchecked, so
    it must validate them against CURRENT constraints — without
    deleting them on violation (they belong to history)."""
    from eeg_data_lake_spark.sources.txlog import CheckConstraintViolation

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, -1)], "k long, v long"))
    t.overwrite(spark.createDataFrame([(2, 2)], "k long, v long"))
    t.add_check_constraint("v_pos", "v > 0")
    with pytest.raises(CheckConstraintViolation, match="resurrect"):
        t.restore(0)
    assert t.version() == 1  # nothing committed
    # history intact: the refused restore deleted nothing
    assert _rows(t.read(version=0)) == {(1, -1)}
    t.drop_check_constraint("v_pos")
    t.restore(0)
    assert _rows(t.read()) == {(1, -1)}


def test_clone_retry_after_crash_and_foreign_refusal(spark, tmp_path):
    """Review finding: a crashed clone (links laid, no commit) must be
    retryable, and unrelated data at the destination must be refused,
    never clobbered."""
    import os

    t = _mk(spark, tmp_path)
    state = t._replay()
    dest = str(tmp_path / "c")
    # simulate the crash: lay SOME of the hardlinks, commit nothing
    crashed = TxTable(spark, dest)
    rel = state.files[0]
    os.makedirs(os.path.dirname(os.path.join(dest, rel)), exist_ok=True)
    os.link(os.path.join(t.path, rel), os.path.join(dest, rel))
    c = t.clone_to(dest)  # retry completes
    assert _rows(c.read()) == _rows(t.read())
    assert crashed.version() == 0

    # foreign data at a destination path: refused intact
    dest2 = str(tmp_path / "d")
    TxTable(spark, dest2)  # creates dirs
    foreign = os.path.join(dest2, state.files[1])
    os.makedirs(os.path.dirname(foreign), exist_ok=True)
    with open(foreign, "wb") as fh:
        fh.write(b"not ours")
    with pytest.raises(ValueError, match="unrelated data"):
        t.clone_to(dest2)
    with open(foreign, "rb") as fh:
        assert fh.read() == b"not ours"  # untouched


def test_compact_index_repairs_projection_after_logical_rewrite(
    spark, tmp_path
):
    """Review finding: a restore/delete under a live projection left
    index_frames raising on every probe until an unrelated compaction
    fired — the staleness predicate now treats logical rewrites as
    repair triggers, so the next maintenance call rebuilds."""
    import uuid

    from eeg_data_lake_spark.sources.indexproj import (
        bucketize_index,
        compact_index,
        index_frames,
    )

    base = f"ixl_{uuid.uuid4().hex[:8]}"
    t = TxTable(spark, str(tmp_path / "idx"))
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    try:
        bucketize_index(t, base, ["k"], n_buckets=4)
        t.delete_where([("k", "=", 2)])
        with pytest.raises(ValueError):
            index_frames(t, base)  # invalidated, as designed
        name = compact_index(
            t, base, ["k"], n_buckets=4, max_small_files=99
        )
        assert name is not None  # repaired WITHOUT any compaction
        frames = index_frames(t, base)
        assert len(frames) == 1
        assert _rows(frames[0]) == {(1, "a")}
    finally:
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith(base):
                spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
