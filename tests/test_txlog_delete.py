"""File-pruned DELETE WHERE on the txlog (Delta's DELETE): only files
whose min/max stats admit a match are rewritten — everything else
stays byte-identical — with SQL NULL-keeps-the-row semantics, change-
feed refusal, and time-travel + vacuum interplay."""

from __future__ import annotations

import os

import pytest

from eeg_data_lake_spark.sources.txlog import TxTable, table_history


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _file_sigs(t: TxTable) -> set[tuple[str, int]]:
    out = set()
    for root, _d, names in os.walk(t.data_dir):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                out.add((os.path.relpath(p, t.path), os.path.getsize(p)))
    return out


def _mk(spark, tmp_path):
    """Three commits with disjoint k-ranges, so per-file stats can
    prune precisely."""
    t = TxTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 10)
            .selectExpr("id as k", "id * 2 as v")
            .coalesce(1)
        )
    return t


def test_delete_rewrites_only_matching_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    state = t._replay()
    untouched_before = {
        f
        for f in state.files
        # files whose k-range cannot contain k < 10
        if int(state.stats[f]["cols"]["k"]["min"]) >= 100
    }
    assert len(untouched_before) == 2
    v = t.delete_where([("k", "<", 5)])
    assert v == t.version()
    got = _rows(t.read().select("k"))
    assert got == {(k,) for k in list(range(5, 10)) + list(range(100, 110)) + list(range(200, 210))}
    # the two non-matching files were not rewritten: same live paths
    live_after = set(t._replay().files)
    assert untouched_before <= live_after
    ops = [r.op for r in table_history(t).collect()]
    assert ops.count("delete") == 1
    # time travel still sees the deleted rows
    assert t.read(version=2).filter("k < 5").count() == 5


def test_delete_with_no_possible_match_is_a_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version()
    sigs0 = _file_sigs(t)
    assert t.delete_where([("k", ">", 10_000)]) == v0
    assert _file_sigs(t) == sigs0  # stats proved it: nothing touched


def test_null_predicate_keeps_the_row(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 5), (2, None), (3, -1)], "k long, v long"
        )
    )
    t.delete_where([("v", "<", 0)])
    assert _rows(t.read()) == {(1, 5), (2, None)}


def test_delete_is_a_logical_rewrite_for_the_change_feed(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    t.delete_where([("k", "<", 5)])
    with pytest.raises(ValueError, match="delete"):
        t.changes(since=2)


def test_delete_conjunction_and_idempotent_txn(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.delete_where(
        [("k", ">=", 100), ("k", "<", 105)], txn_id="purge-1"
    )
    assert t.read().filter("k >= 100 and k < 105").count() == 0
    assert t.read().count() == 25
    assert t.delete_where(
        [("k", ">=", 100), ("k", "<", 105)], txn_id="purge-1"
    ) == v  # replay no-ops
    assert t.version() == v


def test_delete_then_vacuum_erases_bytes(spark, tmp_path):
    """The GDPR flow with the pruned DELETE: after vacuum, no parquet
    file on disk contains the deleted keys."""
    import duckdb

    t = _mk(spark, tmp_path)
    t.delete_where([("k", "=", 3)])
    t.vacuum(keep_versions=0)
    hits = 0
    for rel, _sz in _file_sigs(t):
        p = os.path.join(t.path, rel)
        hits += duckdb.sql(
            f"SELECT count(*) FROM '{p}' WHERE k = 3"
        ).fetchall()[0][0]
    assert hits == 0
    assert t.read().count() == 29


def test_update_rewrites_only_matching_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    state = t._replay()
    untouched_before = {
        f
        for f in state.files
        if int(state.stats[f]["cols"]["k"]["min"]) >= 100
    }
    t.update_where([("k", "<", 5)], {"v": "v + 1000"})
    assert _rows(t.read().filter("k < 5").select("v")) == {
        (k * 2 + 1000,) for k in range(5)
    }
    # non-matching rows in the SAME file unchanged
    assert _rows(t.read().filter("k >= 5 and k < 10").select("v")) == {
        (k * 2,) for k in range(5, 10)
    }
    assert untouched_before <= set(t._replay().files)
    ops = [r.op for r in table_history(t).collect()]
    assert ops.count("update") == 1
    with pytest.raises(ValueError, match="update"):
        t.changes(since=2)


def test_update_set_evaluates_against_old_row(spark, tmp_path):
    """SQL UPDATE semantics: both SET expressions see the ORIGINAL
    values, so swapping two columns actually swaps them."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10, 20)], "k long, a long, b long"))
    t.update_where([("k", "=", 1)], {"a": "b", "b": "a"})
    assert _rows(t.read()) == {(1, 20, 10)}


def test_update_casts_to_column_type_and_unknown_column_raises(
    spark, tmp_path
):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"))
    t.update_where([("k", "=", 1)], {"v": "1.9"})  # double -> long cast
    assert _rows(t.read()) == {(1, 1)}
    with pytest.raises(ValueError, match="not in table"):
        t.update_where([("k", "=", 1)], {"nope": "1"})


def test_update_enforces_check_constraints(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_nonneg", "v >= 0")
    v0 = t.version()
    from eeg_data_lake_spark.sources.txlog import CheckConstraintViolation

    with pytest.raises(CheckConstraintViolation, match="update"):
        t.update_where([("k", "<", 3)], {"v": "-1"})
    assert t.version() == v0
    assert t.read().filter("v < 0").count() == 0


def test_update_null_predicate_leaves_row(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 5), (2, None), (3, -1)], "k long, v long"
        )
    )
    t.update_where([("v", "<", 0)], {"v": "0"})
    assert _rows(t.read()) == {(1, 5), (2, None), (3, 0)}


def test_vacuum_dry_run_lists_without_deleting(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where([("k", "<", 5)])
    sigs0 = _file_sigs(t)
    would = t.vacuum(keep_versions=0, dry_run=True)
    assert would  # the rewritten file's original is reclaimable
    assert _file_sigs(t) == sigs0  # nothing touched
    assert t.read(version=2).count() == 30  # time travel intact
    really = t.vacuum(keep_versions=0)
    assert sorted(really) == sorted(would)  # the dry run told the truth


def test_dml_loses_commit_race_to_concurrent_rewrite(spark, tmp_path):
    """Conflict detection for the new DML: a delete/update whose
    affected files get compacted away underneath it (between its
    snapshot and its commit) must raise instead of committing a
    remove of ghost files."""
    from eeg_data_lake_spark.sources.txlog import (
        ConcurrentModificationError,
    )

    t = _mk(spark, tmp_path)
    orig_write = TxTable._write_data
    fired = []

    def racing_write(self, df):
        files = orig_write(self, df)
        if not fired:
            # a concurrent OPTIMIZE lands after the snapshot was
            # taken (fire once: compact's own write must not recurse)
            fired.append(True)
            TxTable(self.spark, self.path).compact()
        return files

    TxTable._write_data = racing_write
    try:
        with pytest.raises(ConcurrentModificationError):
            t.delete_where([("k", "<", 5)])
    finally:
        TxTable._write_data = orig_write
    # the losing delete committed nothing on top of the compact
    assert t.read().count() == 30


def test_delete_and_update_preserve_evolved_columns(spark, tmp_path):
    """Schema-evolution regression (review finding): rewriting
    affected files must read them under mergeSchema — a plain read
    infers the schema from ONE footer and a delete of unrelated rows
    could silently erase an evolved column's data."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
        .coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(3, 30, "x"), (4, 40, "y")], "k long, v long, w string"
        ).coalesce(1)
    )
    t.delete_where([("k", "=", 1)])
    got = _rows(t.read(merge_schema=True).select("k", "v", "w"))
    assert got == {(2, 20, None), (3, 30, "x"), (4, 40, "y")}
    # update on the evolved column works and old rows stay NULL
    t.update_where([("k", "=", 3)], {"w": "'z'"})
    got = _rows(t.read(merge_schema=True).select("k", "w"))
    assert got == {(2, None), (3, "z"), (4, "y")}


def test_compact_preserves_evolved_columns(spark, tmp_path):
    """Same hazard on OPTIMIZE: bin-packing evolved small files must
    not drop the newer files' columns."""
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10)], "k long, v long"))
    t.append(
        spark.createDataFrame([(2, 20, "x")], "k long, v long, w string")
    )
    t.compact()
    got = _rows(t.read(merge_schema=True).select("k", "v", "w"))
    assert got == {(1, 10, None), (2, 20, "x")}
