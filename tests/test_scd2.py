"""SCD Type 2 over the txlog: version history accumulates with
validity intervals, no-op updates don't explode history, as-of
lookups reconstruct any past state, and replayed merges are no-ops."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.scd import scd2_apply, scd2_as_of
from eeg_data_lake_spark.sources.txlog import TxTable

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


@pytest.fixture()
def dim(spark, tmp_path):
    return TxTable(spark, str(tmp_path / "dim"))


def _upd(spark, rows):
    return spark.createDataFrame(rows, "cust_id long, segment string, country string")


def test_scd2_lifecycle(spark, dim):
    scd2_apply(dim, _upd(spark, [(1, "BUILDING", "FR"), (2, "AUTO", "DE")]),
               ["cust_id"], F.lit(T0), txn_id="b0")
    # t1: cust 1 changes segment; cust 2 unchanged (no-op); cust 3 new
    scd2_apply(dim, _upd(spark, [(1, "MACHINERY", "FR"), (2, "AUTO", "DE"),
                                 (3, "HOUSEHOLD", "US")]),
               ["cust_id"], F.lit(T1), txn_id="b1")
    # t2: cust 1 changes country
    scd2_apply(dim, _upd(spark, [(1, "MACHINERY", "ES")]),
               ["cust_id"], F.lit(T2), txn_id="b2")

    snap = dim.read()
    # cust 1 has 3 versions (2 closed + 1 current); 2 and 3 have 1 each
    per_key = {r.cust_id: r.n for r in
               snap.groupBy("cust_id").agg(F.count("*").alias("n")).collect()}
    assert per_key == {1: 3, 2: 1, 3: 1}
    cur = {r.cust_id: (r.segment, r.country)
           for r in snap.filter("_is_current").collect()}
    assert cur == {1: ("MACHINERY", "ES"), 2: ("AUTO", "DE"),
                   3: ("HOUSEHOLD", "US")}

    # point-in-time reconstruction at each epoch
    at_t0 = {r.cust_id: r.segment
             for r in scd2_as_of(snap, F.lit(T0)).collect()}
    assert at_t0 == {1: "BUILDING", 2: "AUTO"}
    mid = {r.cust_id: (r.segment, r.country)
           for r in scd2_as_of(snap, F.lit(T1 + dt.timedelta(days=3))).collect()}
    assert mid == {1: ("MACHINERY", "FR"), 2: ("AUTO", "DE"),
                   3: ("HOUSEHOLD", "US")}
    # validity intervals chain without gaps for cust 1
    iv = sorted((r._valid_from, r._valid_to) for r in
                snap.filter("cust_id = 1").collect())
    assert iv == [(T0, T1), (T1, T2), (T2, None)]


def test_scd2_noop_batch_adds_no_history(spark, dim):
    scd2_apply(dim, _upd(spark, [(1, "A", "FR")]), ["cust_id"], F.lit(T0))
    v = dim.version()
    scd2_apply(dim, _upd(spark, [(1, "A", "FR")]), ["cust_id"], F.lit(T1))
    assert dim.read().count() == 1  # identical attrs → no new version
    assert dim.version() == v + 1  # the (all-pass-through) commit still lands


def test_scd2_replay_is_idempotent(spark, dim):
    scd2_apply(dim, _upd(spark, [(1, "A", "FR")]), ["cust_id"],
               F.lit(T0), txn_id="s0")
    scd2_apply(dim, _upd(spark, [(1, "B", "FR")]), ["cust_id"],
               F.lit(T1), txn_id="s1")
    v = dim.version()
    # orchestrator retry replays the same logical batch
    scd2_apply(dim, _upd(spark, [(1, "B", "FR")]), ["cust_id"],
               F.lit(T1), txn_id="s1")
    assert dim.version() == v
    assert dim.read().count() == 2


def test_scd2_fact_join_as_of_fact_time(spark, dim):
    """The consuming pattern: each fact row joins the dimension version
    valid at ITS OWN timestamp (not today's)."""
    scd2_apply(dim, _upd(spark, [(1, "BUILDING", "FR")]), ["cust_id"], F.lit(T0))
    scd2_apply(dim, _upd(spark, [(1, "MACHINERY", "FR")]), ["cust_id"], F.lit(T1))
    facts = spark.createDataFrame(
        [(100, 1, T0 + dt.timedelta(days=5)), (101, 1, T1 + dt.timedelta(days=5))],
        "order_id long, cust_id long, ts timestamp",
    )
    d = dim.read()
    joined = facts.join(
        d,
        (facts.cust_id == d.cust_id)
        & (d["_valid_from"] <= facts.ts)
        & (d["_valid_to"].isNull() | (facts.ts < d["_valid_to"])),
    ).select("order_id", "segment")
    got = {r.order_id: r.segment for r in joined.collect()}
    assert got == {100: "BUILDING", 101: "MACHINERY"}


def test_scd2_duplicate_business_keys_rejected(spark, dim):
    scd2_apply(dim, _upd(spark, [(1, "gold", "US")]), ["cust_id"], F.lit(T0))
    with pytest.raises(ValueError, match="duplicate business keys"):
        scd2_apply(
            dim,
            _upd(spark, [(1, "gold", "US"), (1, "silver", "US")]),
            ["cust_id"],
            F.lit(T1),
        )


def test_scd2_null_business_key_update_applies(spark, dim):
    """NULL business keys are legal (the join is null-safe): an update
    for a NULL key must insert/close like any other key, not be
    silently discarded."""
    scd2_apply(
        dim,
        _upd(spark, [(None, "unknown", "??"), (1, "gold", "US")]),
        ["cust_id"],
        F.lit(T0),
    )
    scd2_apply(
        dim, _upd(spark, [(None, "known", "DE")]), ["cust_id"], F.lit(T1)
    )
    cur = {
        r.cust_id: r.segment
        for r in dim.read().filter(F.col("_is_current")).collect()
    }
    assert cur == {None: "known", 1: "gold"}
    closed = dim.read().filter(~F.col("_is_current")).collect()
    assert len(closed) == 1 and closed[0].cust_id is None
    assert closed[0].segment == "unknown" and closed[0]._valid_to == T1
