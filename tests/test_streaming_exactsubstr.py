"""Incremental streaming ExactSubstr: union-replay equals batch z18,
late cross-batch duplication removes OLD batches' tokens, the gram
index stays bounded (<= 2 rows per gram), and replays are no-ops."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.exactsubstr import (
    exact_substring_removal,
    gram_index_table,
    ingest_batch_writer,
    stream_exactsubstr_ingest,
)
from eeg_data_lake_spark.workload.curation import _ESD_L, z18_exact_substring_dedup

SCHEMA = "doc_id bigint, text string"


def _w(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _batches():
    """Three micro-batches with every interesting duplication shape:
    within-batch, cross-batch ADJACENT, and cross-batch LATE (batch 0
    text duplicated only by batch 2 — the case per-batch eager removal
    gets wrong)."""
    span_a = _w(_ESD_L + 2, "a")   # within batch 0, twice
    span_b = _w(_ESD_L, "b")       # batch 0 then batch 1
    span_c = _w(_ESD_L + 4, "c")   # batch 0 then batch 2 (LATE)
    b0 = [
        (0, f"{span_a} {_w(3, 'x')} {span_a}"),
        (1, f"{_w(2, 'y')} {span_b}"),
        (2, f"{span_c} {_w(5, 'z')}"),
        (3, _w(20, "u")),                      # unique, untouched
    ]
    b1 = [
        (10, f"{span_b} {_w(4, 'm')}"),
        (11, _w(_ESD_L - 1, "s")),             # too short for a gram
    ]
    b2 = [
        (20, f"{_w(1, 'q')} {span_c}"),
        (21, ""),                              # empty text
    ]
    return [b0, b1, b2]


@pytest.fixture()
def staged(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    union = []
    for i, rows in enumerate(_batches()):
        union.extend(rows)
        stage = tmp_path / f"stage_{i}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(stage)
        )
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.rename(str(stage / part), str(src / f"batch_{i}.parquet"))
    # the union corpus as a documents.parquet dir for the batch oracle
    uni = tmp_path / "union"
    uni.mkdir()
    spark.createDataFrame(union, SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "u_stage")
    )
    part = next(
        f
        for f in os.listdir(tmp_path / "u_stage")
        if f.endswith(".parquet")
    )
    os.rename(
        str(tmp_path / "u_stage" / part), str(uni / "documents.parquet")
    )
    return str(src), str(uni)


def _drain(spark, src, tmp_path, run="run"):
    table = TxTable(spark, str(tmp_path / "corpus"))
    stream_exactsubstr_ingest(
        spark,
        src,
        SCHEMA,
        table,
        str(tmp_path / "ckpt"),
        sink_id="esd",
    )
    return table


def test_union_replay_equals_batch_z18(spark, staged, tmp_path):
    src, uni = staged
    table = _drain(spark, src, tmp_path)
    inc = sorted(exact_substring_removal(table).collect())
    batch = sorted(z18_exact_substring_dedup(spark, uni).collect())
    assert inc == batch
    # and the late case really bit: batch-0's doc 2 lost span_c's
    # tokens even though its duplicate only arrived in batch 2
    rows = {r.doc_id: r for r in inc}
    assert rows[2].n_removed == _ESD_L + 4
    assert rows[20].n_removed == _ESD_L + 4
    # within-batch + adjacent cross-batch shapes too
    assert rows[0].n_removed == 2 * (_ESD_L + 2)
    assert rows[1].n_removed == _ESD_L and rows[10].n_removed == _ESD_L
    assert rows[3].n_removed == 0 and rows[11].n_removed == 0


def test_gram_index_bounded_and_saturating(spark, staged, tmp_path):
    src, _ = staged
    table = _drain(spark, src, tmp_path)
    idx = gram_index_table(spark, table).read()
    per_gram = idx.groupBy("g").agg(
        F.count("*").alias("rows"), F.sum("c").alias("t")
    )
    mx = per_gram.agg(
        F.max("rows").alias("r"), F.max("t").alias("t")
    ).collect()[0]
    assert mx.r <= 2 and mx.t <= 3  # <=2 rows; sum can be 1, 2 or 2+1
    # saturating: span_a appears twice in ONE batch -> single c=2 row
    # and no gram ever needs a third row even when seen in 3+ places


def test_checkpoint_replay_is_noop(spark, staged, tmp_path):
    src, _ = staged
    table = _drain(spark, src, tmp_path)
    v_corpus = table.version()
    v_idx = gram_index_table(spark, table).version()
    before = sorted(exact_substring_removal(table).collect())
    # re-drain with the SAME checkpoint: nothing new to commit
    stream_exactsubstr_ingest(
        spark,
        src,
        SCHEMA,
        table,
        str(tmp_path / "ckpt"),
        sink_id="esd",
    )
    assert table.version() == v_corpus
    assert gram_index_table(spark, table).version() == v_idx
    assert sorted(exact_substring_removal(table).collect()) == before


def test_crash_between_commits_heals_on_replay(spark, tmp_path):
    """Simulate foreachBatch dying AFTER the corpus append but BEFORE
    the index append: the replayed batch must no-op the corpus and
    complete the index with identical content."""
    table = TxTable(spark, str(tmp_path / "corpus"))
    rows = [(0, _w(_ESD_L, "d")), (1, _w(_ESD_L, "d"))]  # dup pair
    batch = spark.createDataFrame(rows, SCHEMA)
    # the crash: corpus commit lands, index commit never happens
    table.append(batch, txn_id="esd:batch-0")
    with pytest.raises(ValueError):  # index table has no data yet
        gram_index_table(spark, table).read()
    # driver restarts; foreachBatch replays batch 0 in full
    ingest_batch_writer(table, "esd")(batch, 0)
    assert table.read().count() == 2  # corpus append no-opped
    out = {r.doc_id: r for r in exact_substring_removal(table).collect()}
    assert out[0].n_removed == _ESD_L and out[1].n_removed == _ESD_L


def test_seeded_corpus_grams_backfilled_before_first_fold(
    spark, tmp_path
):
    """A corpus seeded outside this writer has no gram index; the
    first streamed batch must backfill the seed's gram counts, or a
    batch duplicating seeded text would never reach the >=2 saturation
    and removal under-removes forever."""
    span = _w(_ESD_L + 3, "d")
    table = TxTable(spark, str(tmp_path / "corpus"))
    table.append(
        spark.createDataFrame([(1, f"{span} {_w(2, 'x')}")], SCHEMA),
        txn_id="bootstrap",
    )
    writer = ingest_batch_writer(table, sink_id="seeded")
    # doc 100 duplicates the SEED's span; doc 101 is fresh
    writer(
        spark.createDataFrame(
            [(100, f"{_w(1, 'y')} {span}"), (101, _w(20, "f"))], SCHEMA
        ),
        0,
    )
    idx = gram_index_table(spark, table)
    assert idx.has_txn("seeded:grams-backfill")
    out = {
        r.doc_id: (r.n_tokens, r.n_removed)
        for r in exact_substring_removal(table).collect()
    }
    # the duplicated span's tokens are removed from BOTH sides
    assert out[1][1] >= _ESD_L
    assert out[100][1] >= _ESD_L
    assert out[101] == (20, 0)


def test_crashed_first_batch_replay_does_not_double_count(
    spark, tmp_path
):
    """COUNT-semantics crash window: the FIRST batch crashes between
    its corpus and gram-index legs, so the corpus holds the batch's
    rows with no index. The replay's backfill must EXCLUDE those rows
    (they are counted by the replayed index leg), or every singleton
    gram of the batch would count twice, become a false duplicate, and
    be over-removed."""
    batch = spark.createDataFrame(
        [(0, _w(_ESD_L + 5, "a")), (1, _w(_ESD_L + 2, "b"))], SCHEMA
    )
    table = TxTable(spark, str(tmp_path / "corpus"))
    # crash: corpus leg committed, index leg lost
    table.append(batch, txn_id="seeded:batch-0")
    writer = ingest_batch_writer(table, sink_id="seeded")
    writer(batch, 0)  # replay
    # unique text: NOTHING may be removed
    out = {
        r.doc_id: r.n_removed
        for r in exact_substring_removal(table).collect()
    }
    assert out == {0: 0, 1: 0}
    # and the index holds each gram once (bounded-state invariant)
    idx = gram_index_table(spark, table)
    per_gram = (
        idx.read().groupBy("g").agg(F.sum("c").alias("t")).collect()
    )
    assert all(r.t == 1 for r in per_gram)
