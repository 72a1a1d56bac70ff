"""MERGE INTO over the txlog table: update/delete/insert in one batch,
Delta's duplicate-source rejection, clause subsets, replay idempotence,
and pre-merge time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.sources.txmerge import merge_into


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "m"))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, name string, score double",
        ),
        txn_id="seed",
    )
    return t


def _rows(t):
    return {r["id"]: (r["name"], r["score"]) for r in t.read().collect()}


def test_update_delete_insert_in_one_batch(spark, table):
    # CDC-style batch: update id 1, delete id 2, insert id 9
    src = spark.createDataFrame(
        [(1, "a2", 11.0, "U"), (2, "b", 20.0, "D"), (9, "z", 90.0, "U")],
        "id long, name string, score double, op string",
    )
    merge_into(
        table,
        src,
        keys=["id"],
        when_matched_update=["name", "score"],
        when_matched_delete=lambda t, s: s["op"] == "D",
        txn_id="cdc-1",
    )
    assert _rows(table) == {
        1: ("a2", 11.0),
        3: ("c", 30.0),   # untouched key survives
        9: ("z", 90.0),   # inserted (op column isn't in the target)
    }
    # pre-merge version still readable (time travel)
    old = {r["id"] for r in table.read(version=0).collect()}
    assert old == {1, 2, 3}


def test_replay_is_idempotent(spark, table):
    src = spark.createDataFrame([(1, "x", 1.0)], "id long, name string, score double")
    v = merge_into(table, src, keys=["id"], txn_id="m-1")
    assert merge_into(table, src, keys=["id"], txn_id="m-1") == v
    assert _rows(table)[1] == ("x", 1.0)


def test_duplicate_source_keys_rejected(spark, table):
    src = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "id long, name string, score double"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_into(table, src, keys=["id"])


def test_update_subset_and_no_insert(spark, table):
    src = spark.createDataFrame(
        [(1, "ignored", 99.0), (7, "new", 70.0)],
        "id long, name string, score double",
    )
    merge_into(
        table,
        src,
        keys=["id"],
        when_matched_update=["score"],      # name NOT updated
        when_not_matched_insert=False,      # id 7 NOT inserted
        txn_id="subset",
    )
    got = _rows(table)
    assert got[1] == ("a", 99.0)
    assert 7 not in got


def test_merge_into_empty_table_inserts(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "fresh"))
    src = spark.createDataFrame([(5, "e", 50.0)], "id long, name string, score double")
    merge_into(t, src, keys=["id"], txn_id="first")
    assert _rows(t) == {5: ("e", 50.0)}


def test_target_only_columns_preserved_and_nulled(spark, tmp_path):
    """Target has an extra column the source lacks: updates keep it,
    inserts get NULL there (Delta's NOT MATCHED behavior for columns
    absent from the INSERT clause)."""
    t = TxTable(spark, str(tmp_path / "extra"))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0, "keep-me")],
            "id long, name string, score double, note string",
        ),
        txn_id="seed",
    )
    src = spark.createDataFrame(
        [(1, "a2", 11.0), (2, "b", 20.0)], "id long, name string, score double"
    )
    merge_into(t, src, keys=["id"], txn_id="m")
    rows = {r["id"]: r for r in t.read().collect()}
    assert rows[1]["note"] == "keep-me"
    assert rows[2]["note"] is None


def test_null_key_target_row_survives_merge(spark, tmp_path):
    """NULL merge keys are legal (the join is null-safe); a target row
    with a NULL key and no matching source row must pass through the
    merge untouched, not silently vanish."""
    t = TxTable(spark, str(tmp_path / "nk"))
    t.append(
        spark.createDataFrame(
            [(None, "orphan", 0.0), (1, "a", 10.0)],
            "id long, name string, score double",
        )
    )
    merge_into(
        t,
        spark.createDataFrame([(2, "b", 20.0)], "id long, name string, score double"),
        keys=["id"],
    )
    rows = {r["id"]: (r["name"], r["score"]) for r in t.read().collect()}
    assert rows == {None: ("orphan", 0.0), 1: ("a", 10.0), 2: ("b", 20.0)}


def test_null_key_source_row_updates_null_key_target(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "nk2"))
    t.append(
        spark.createDataFrame(
            [(None, "orphan", 0.0), (1, "a", 10.0)],
            "id long, name string, score double",
        )
    )
    merge_into(
        t,
        spark.createDataFrame(
            [(None, "adopted", 5.0)], "id long, name string, score double"
        ),
        keys=["id"],
    )
    rows = {r["id"]: (r["name"], r["score"]) for r in t.read().collect()}
    assert rows == {None: ("adopted", 5.0), 1: ("a", 10.0)}
