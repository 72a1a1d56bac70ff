"""Txlog manifest checkpointing (Delta's `_last_checkpoint` analog):
table open reads only the rollup + manifest tail (files-read
assertion), results and time travel/CDC/vacuum semantics are unchanged
across the rollup boundary, txn idempotence survives the rollup, and a
crash around the rollup write is harmless."""

from __future__ import annotations

import builtins
import json
import os

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable


def _one(spark, k):
    # single partition: no empty stat-less part files, so the
    # data-skipping assertion below counts real files only
    return spark.createDataFrame(
        [(k, f"v{k}")], "k long, v string"
    ).coalesce(1)


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable(spark, str(tmp_path / "tbl"))


def _manifest_reads(monkeypatch, fn):
    """Run fn() while recording which commit manifests get opened."""
    opened: list[str] = []
    real_open = builtins.open

    def spy(path, *a, **k):
        p = str(path)
        name = os.path.basename(p)
        if os.sep + "_txlog" + os.sep in p and name.endswith(".json"):
            opened.append(name)
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", spy)
    try:
        out = fn()
    finally:
        monkeypatch.undo()
    manifests = [n for n in opened if n[:-5].isdigit()]
    ckpts = [n for n in opened if n.startswith("_checkpoint-")]
    return out, manifests, ckpts


def test_open_reads_only_rollup_plus_tail(spark, table, monkeypatch):
    for i in range(20):  # versions 0..19; auto-rollup lands at v16
        table.append(_one(spark, i))
    assert os.path.exists(
        os.path.join(table.log_dir, "_checkpoint-00000016.json")
    )
    v, manifests, ckpts = _manifest_reads(monkeypatch, table.version)
    assert v == 19
    # only the tail AFTER the rollup is opened: v17, v18, v19
    assert sorted(manifests) == [
        "00000017.json", "00000018.json", "00000019.json"
    ]
    assert ckpts == ["_checkpoint-00000016.json"]


def test_content_and_time_travel_across_rollup_boundary(spark, table):
    for i in range(18):
        table.append(_one(spark, i))
    # latest content: everything
    assert {r.k for r in table.read().collect()} == set(range(18))
    # time travel BELOW the rollup (fold-from-scratch path)
    assert {r.k for r in table.read(version=4).collect()} == set(range(5))
    # time travel AT and ABOVE the rollup
    assert {r.k for r in table.read(version=16).collect()} == set(range(17))
    assert {r.k for r in table.read(version=17).collect()} == set(range(18))


def test_cdc_and_vacuum_semantics_unchanged(spark, table):
    for i in range(18):
        table.append(_one(spark, i))
    # change feed spanning the rollup version reads the manifests, so
    # the rollup must not perturb it
    got = {
        (r.k, r._commit_version)
        for r in table.changes(since=14, to=17).collect()
    }
    assert got == {(15, 15), (16, 16), (17, 17)}
    # vacuum retains by version exactly as before (the overwrite at
    # v18 makes the appended files dead below the retention floor)
    table.overwrite(
        spark.createDataFrame([(999, "x")], "k long, v string")
    )
    deleted = table.vacuum(keep_versions=0)
    assert deleted  # the 18 pre-overwrite files are unreachable now
    assert {r.k for r in table.read().collect()} == {999}
    with pytest.raises(Exception):
        table.read(version=3).collect()


def test_txn_idempotence_survives_the_rollup(spark, table):
    table.append(_one(spark, 0), txn_id="once")
    for i in range(1, 17):  # push a rollup past the txn commit
        table.append(_one(spark, i))
    v = table.version()
    assert table.has_txn("once")
    table.append(_one(spark, 99), txn_id="once")  # replay: no-op
    assert table.version() == v
    assert 99 not in {r.k for r in table.read().collect()}


def test_crash_debris_and_missing_rollup_are_harmless(spark, table):
    for i in range(17):
        table.append(_one(spark, i))
    # a crash mid-rollup leaves only a tmp file — never a visible one
    with open(os.path.join(table.log_dir, ".ckpt-tmp-dead"), "w") as fh:
        fh.write("{not even json")
    assert {r.k for r in table.read().collect()} == set(range(17))
    # deleting the rollup entirely degrades to the full fold
    os.unlink(os.path.join(table.log_dir, "_checkpoint-00000016.json"))
    assert table.version() == 16
    assert {r.k for r in table.read().collect()} == set(range(17))


def test_explicit_checkpoint_and_pruning(spark, table, monkeypatch):
    for i in range(3):
        table.append(_one(spark, i))
    assert table.checkpoint() == 2
    for i in range(3, 6):
        table.append(_one(spark, i))
    assert table.checkpoint() == 5
    table.append(_one(spark, 6))
    assert table.checkpoint() == 6
    # only the newest two rollups are kept
    names = sorted(
        n for n in os.listdir(table.log_dir) if n.startswith("_checkpoint")
    )
    assert names == [
        "_checkpoint-00000005.json", "_checkpoint-00000006.json"
    ]
    # open folds from the newest rollup with an EMPTY manifest tail
    _, manifests, ckpts = _manifest_reads(monkeypatch, table.version)
    assert manifests == []
    assert ckpts == ["_checkpoint-00000006.json"]
    # deep time travel below every surviving rollup still works
    assert {r.k for r in table.read(version=1).collect()} == {0, 1}


def test_rollup_preserves_data_skipping_stats(spark, table):
    for i in range(17):
        table.append(_one(spark, i))
    # stats survive the rollup: predicate pruning still prunes files
    files = table.matching_files([("k", "=", 3)])
    assert len(files) == 1
    # and honest reads agree
    assert [r.k for r in table.read(predicates=[("k", "=", 3)]).collect()] == [3]


def test_overwrite_and_upsert_fold_correctly_through_rollup(spark, table):
    for i in range(10):
        table.append(_one(spark, i))
    table.overwrite(
        spark.createDataFrame([(100, "x")], "k long, v string")
    )
    for i in range(200, 206):  # cross the rollup boundary (v16 = append)
        table.append(_one(spark, i))
    table.upsert(
        spark.createDataFrame([(100, "y"), (300, "z")], "k long, v string"),
        ["k"],
    )
    got = {(r.k, r.v) for r in table.read().collect()}
    want = {(i, f"v{i}") for i in range(200, 206)} | {(100, "y"), (300, "z")}
    assert got == want


def test_wide_checkpoint_names_load_and_prune(spark, table):
    """The writer pads versions with {:08d}, which emits 9+ digits past
    10^8 — the reader/pruner must accept any width or rollups written
    there are never loaded (replay silently degrades to O(versions))
    and never pruned."""
    from eeg_data_lake_spark.sources.txlog import _LogState

    table.append(_one(spark, 0))
    table.append(_one(spark, 1))
    state = table._replay()
    big = 10**8  # {:08d} formats this as NINE digits
    table._write_checkpoint(
        _LogState(big, state.files, state.txn_ids, state.stats)
    )
    assert os.path.exists(
        os.path.join(table.log_dir, f"_checkpoint-{big}.json")
    )
    assert big in table._checkpoint_versions()
    # the wide rollup is the one that seeds replay (newest) — content
    # equals the real state, so the read is unchanged
    assert {r.k for r in table.read().collect()} == {0, 1}
    # and the pruner can unlink wide names: write two more rollups,
    # only the newest two survive regardless of digit width
    table._write_checkpoint(
        _LogState(big + 1, state.files, state.txn_ids, state.stats)
    )
    table._write_checkpoint(
        _LogState(big + 2, state.files, state.txn_ids, state.stats)
    )
    assert table._checkpoint_versions() == [big + 1, big + 2]


def test_checkpoint_write_failure_never_fails_a_landed_commit(
    spark, table, monkeypatch
):
    """The rollup is an accelerator, never the source of truth: the
    manifest hard-link has already SUCCEEDED when the interval rollup
    is written, so a rollup failure (disk full, permissions) must not
    propagate — a txn-less caller retrying "the failed commit" would
    append the same data twice."""

    def boom(state):
        raise OSError("disk full")

    monkeypatch.setattr(table, "_write_checkpoint", boom)
    for i in range(17):  # v16 is the rollup interval — boom fires there
        table.append(_one(spark, i))
    assert table.version() == 16
    assert table.read().count() == 17
    assert table._checkpoint_versions() == []  # rollup really did fail
    monkeypatch.undo()
    # the NEXT interval writes one as usual
    for i in range(17, 33):
        table.append(_one(spark, i))
    assert 32 in table._checkpoint_versions()
    assert table.read().count() == 33
