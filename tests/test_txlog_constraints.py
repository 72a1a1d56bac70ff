"""Row-level CHECK constraints on the txlog (Delta's ALTER TABLE ADD
CONSTRAINT): violating writes abort atomically before their manifest
exists, NULL passes (SQL standard), existing violations block the add,
and constraints travel with clones and survive handle reopens."""

from __future__ import annotations

import pytest

from eeg_data_lake_spark.sources.txlog import (
    CheckConstraintViolation,
    TxTable,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _mk(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    return t


def test_violating_append_aborts_atomically(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_positive", "v > 0")
    v0 = t.version()
    with pytest.raises(CheckConstraintViolation, match="v_positive"):
        t.append(spark.createDataFrame([(3, -5)], "k long, v long"))
    assert t.version() == v0  # nothing committed
    assert _rows(t.read()) == {(1, 10), (2, 20)}
    # a passing append still commits
    t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
    assert (3, 30) in _rows(t.read())


def test_null_passes_sql_standard(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_positive", "v > 0")
    t.append(spark.createDataFrame([(4, None)], "k long, v long"))
    assert (4, None) in _rows(t.read())
    # NOT-NULL intent needs the explicit conjunct, as in Delta — and
    # the NULL row just written now (correctly) blocks adding it
    with pytest.raises(CheckConstraintViolation, match="existing rows"):
        t.add_check_constraint("v_set", "v IS NOT NULL")
    t.overwrite(spark.createDataFrame([(1, 10)], "k long, v long"))
    t.add_check_constraint("v_set", "v IS NOT NULL")
    with pytest.raises(CheckConstraintViolation, match="v_set"):
        t.append(spark.createDataFrame([(5, None)], "k long, v long"))


def test_add_refuses_existing_violations(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, -1)], "k long, v long"))
    with pytest.raises(CheckConstraintViolation, match="existing rows"):
        t.add_check_constraint("v_positive", "v > 0")
    assert t.check_constraints() == {}  # nothing persisted


def test_redefine_requires_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("c", "v > 0")
    t.add_check_constraint("c", "v > 0")  # same expr: no-op
    with pytest.raises(ValueError, match="different expression"):
        t.add_check_constraint("c", "v > 5")
    t.drop_check_constraint("c")
    t.drop_check_constraint("c")  # missing: no-op (IF EXISTS)
    t.append(spark.createDataFrame([(9, -9)], "k long, v long"))
    assert (9, -9) in _rows(t.read())


def test_enforced_on_overwrite_and_upsert(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_positive", "v > 0")
    with pytest.raises(CheckConstraintViolation, match="overwrite"):
        t.overwrite(spark.createDataFrame([(1, -1)], "k long, v long"))
    with pytest.raises(CheckConstraintViolation, match="upsert"):
        t.upsert(
            spark.createDataFrame([(1, -1)], "k long, v long"), ["k"]
        )
    assert _rows(t.read()) == {(1, 10), (2, 20)}  # both aborted
    t.upsert(spark.createDataFrame([(1, 11)], "k long, v long"), ["k"])
    assert _rows(t.read()) == {(1, 11), (2, 20)}


def test_constraints_persist_and_travel_with_clones(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_positive", "v > 0")
    # fresh handle over the same path sees (and enforces) it
    t2 = TxTable(spark, str(tmp_path / "t"))
    assert t2.check_constraints() == {"v_positive": "v > 0"}
    with pytest.raises(CheckConstraintViolation):
        t2.append(spark.createDataFrame([(3, -1)], "k long, v long"))
    # the clone inherits the constraint
    c = t.clone_to(str(tmp_path / "c"))
    assert c.check_constraints() == {"v_positive": "v > 0"}
    with pytest.raises(CheckConstraintViolation):
        c.append(spark.createDataFrame([(3, -1)], "k long, v long"))


def test_parse_error_surfaces_at_add_time(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(Exception):
        t.add_check_constraint("bad", "v >>>> !!")
    assert t.check_constraints() == {}


def test_replay_of_committed_txn_skips_enforcement(spark, tmp_path):
    """Crash-recovery invariant: re-running an already-committed
    txn_id must stay a no-op even when a constraint added AFTER the
    original commit would reject the batch's rows today (possible
    because the original rows were overwritten away before the add's
    existing-data validation ran)."""
    t = TxTable(spark, str(tmp_path / "t"))
    bad = spark.createDataFrame([(1, -1)], "k long, v long")
    t.append(bad, txn_id="batch-0")
    t.overwrite(spark.createDataFrame([(2, 2)], "k long, v long"))
    t.add_check_constraint("v_positive", "v > 0")  # current data clean
    v = t.version()
    # the streaming writer's crash-replay re-runs batch-0 verbatim:
    # must no-op, not raise
    assert t.append(bad, txn_id="batch-0") == v
    assert _rows(t.read()) == {(2, 2)}
