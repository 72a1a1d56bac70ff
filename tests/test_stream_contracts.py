"""Per-trigger schema contracts on the streaming sinks: a mid-stream
upstream schema change must fail its micro-batch LOUDLY (and replay
clean after the fix), not land whatever the parquet append accepts —
round-8 wiring of sources/contracts.py into streaming/txpair.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eeg_data_lake_spark.sources.contracts import (
    append_compatibility_problems,
)
from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.txpair import (
    batch_txn,
    chained_commit,
    contract_gate,
)


def _schema(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


class TestAppendCompatibility:
    def test_identical_ok(self, spark):
        s = _schema("a bigint, b string")
        assert append_compatibility_problems(s, s) == []

    def test_additive_nullable_ok(self, spark):
        old = _schema("a bigint")
        new = _schema("a bigint, b string")
        assert append_compatibility_problems(old, new) == []

    def test_additive_non_nullable_ok_for_appends(self, spark):
        """Evolution refuses a declared non-nullable new column (old
        files can't supply it), but APPENDING one is safe — the merged
        read schema relaxes it to nullable for old files. The seeded-
        corpus ingests rely on this: backfilled batches append derived
        non-nullable columns (md5 bands) the seed lacks."""
        old = _schema("a bigint")
        new = T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("b", T.StringType(), nullable=False),
            ]
        )
        assert append_compatibility_problems(old, new) == []

    def test_drop_refused(self, spark):
        probs = append_compatibility_problems(
            _schema("a bigint, b string"), _schema("a bigint")
        )
        assert probs and "dropped" in probs[0]

    def test_widening_refused(self, spark):
        """int→long is value-preserving for casting readers, but
        TxTable merge-on-read and the CDC DDL refuse type differences
        — the append gate must too."""
        probs = append_compatibility_problems(
            _schema("a int"), _schema("a bigint")
        )
        assert probs and "incompatible type" in probs[0]

    def test_narrowing_refused(self, spark):
        probs = append_compatibility_problems(
            _schema("a bigint"), _schema("a int")
        )
        assert probs and "incompatible type" in probs[0]

    def test_non_nullable_batch_into_nullable_table_ok(self, spark):
        """The direction that matters for APPENDS: a batch column that
        can't be NULL is always storable under a nullable contract —
        F.lit()-built columns land non-nullable and must not refuse."""
        old = _schema("a bigint, tag string")  # nullable (parquet read)
        new = T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("tag", T.StringType(), nullable=False),
            ]
        )
        assert append_compatibility_problems(old, new) == []

    def test_nullable_batch_into_non_nullable_contract_refused(self, spark):
        old = T.StructType(
            [T.StructField("a", T.LongType(), nullable=False)]
        )
        new = _schema("a bigint")
        probs = append_compatibility_problems(old, new)
        assert probs and "non-nullable column contract" in probs[0]


def test_contract_gate_first_write_defines_contract(spark, tmp_path):
    tbl = TxTable(spark, os.path.join(str(tmp_path), "t"))
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    contract_gate(tbl, df)  # empty table: no contract yet, no raise


def test_chained_commit_gates_every_leg(spark, tmp_path):
    corpus = TxTable(spark, os.path.join(str(tmp_path), "c"))
    idx = TxTable(spark, os.path.join(str(tmp_path), "c_idx"))
    ok = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    ok_idx = spark.createDataFrame([("x", 1)], "k string, doc_id bigint")
    chained_commit(corpus, ok, [(idx, ok_idx, "k")], "s", 0)

    # batch 1 arrives NARROWED (doc_id int): the corpus leg must
    # refuse before anything commits
    bad = spark.createDataFrame([(2, "y")], "doc_id int, text string")
    with pytest.raises(ValueError, match="schema contract violation"):
        chained_commit(corpus, bad, [(idx, ok_idx, "k")], "s", 1)
    assert not corpus.has_txn(batch_txn("s", 1))
    v_before = corpus.version()

    # an INDEX leg deriving a dropped column refuses after the corpus
    # leg landed — replay then no-ops the corpus and still refuses
    ok2 = spark.createDataFrame([(2, "y")], "doc_id bigint, text string")
    bad_idx = spark.createDataFrame([("y",)], "k string")
    with pytest.raises(ValueError, match="schema contract violation"):
        chained_commit(corpus, ok2, [(idx, bad_idx, "k")], "s", 1)
    assert corpus.has_txn(batch_txn("s", 1))
    with pytest.raises(ValueError, match="schema contract violation"):
        chained_commit(corpus, ok2, [(idx, bad_idx, "k")], "s", 1)
    assert corpus.version() == v_before + 1  # replay added no commit

    # the FIXED batch replays clean: corpus no-ops on its txn id, the
    # index leg completes — exactly-once end state
    ok2_idx = spark.createDataFrame([("y", 2)], "k string, doc_id bigint")
    chained_commit(corpus, ok2, [(idx, ok2_idx, "k")], "s", 1)
    assert corpus.read().count() == 2 and idx.read().count() == 2

    # additive evolution PASSES the gate (merge-on-read territory)
    wide = spark.createDataFrame(
        [(3, "z", "en")], "doc_id bigint, text string, lang string"
    )
    contract_gate(corpus, wide)


def test_stream_ingest_refuses_drifted_schema_then_replays_clean(
    spark, tmp_path
):
    """Family-level: a txsink file stream whose declared schema
    NARROWS between runs fails its trigger loudly; re-running with the
    original schema and the SAME checkpoint lands the pending file
    exactly once."""
    from pyspark.errors import StreamingQueryException

    from eeg_data_lake_spark.streaming.txsink import stream_to_txtable

    d = str(tmp_path)
    src = os.path.join(d, "in")
    os.makedirs(src)
    tbl = TxTable(spark, os.path.join(d, "t"))
    ck = os.path.join(d, "ck")

    spark.createDataFrame([(1, 10)], "doc_id bigint, v bigint").coalesce(
        1
    ).write.parquet(os.path.join(src, "f0"))
    stream_to_txtable(
        spark, src + "/*", "doc_id bigint, v bigint", tbl, ck, "s"
    )
    assert tbl.read().count() == 1

    spark.createDataFrame([(2, 20)], "doc_id bigint, v bigint").coalesce(
        1
    ).write.parquet(os.path.join(src, "f1"))
    with pytest.raises(StreamingQueryException, match="contract"):
        stream_to_txtable(
            spark, src + "/*", "doc_id int, v bigint", tbl, ck, "s"
        )
    assert tbl.read().count() == 1  # refused trigger committed nothing

    # fix the schema, same checkpoint: the failed trigger replays and
    # lands exactly once
    stream_to_txtable(
        spark, src + "/*", "doc_id bigint, v bigint", tbl, ck, "s"
    )
    assert sorted(r.doc_id for r in tbl.read().collect()) == [1, 2]


def test_curation_family_gates_per_trigger(spark, tmp_path):
    """The five-table curation ingest rides chained_commit, so a
    drifted batch refuses at the corpus leg — spot-check the family
    wiring (the crash matrix itself lives in test_txpair.py)."""
    from eeg_data_lake_spark.streaming.curation import (
        curation_batch_writer,
    )

    tbl = TxTable(spark, os.path.join(str(tmp_path), "cur"))
    w = curation_batch_writer(tbl, "sx")
    w(
        spark.createDataFrame(
            [(1, "alpha beta gamma", "en")],
            "doc_id bigint, text string, lang string",
        ),
        0,
    )
    # lang drifts string → bigint upstream: the writer's own
    # projections tolerate it (a dropped column would fail at
    # derivation, upstream of the gate), so the GATE must refuse it
    with pytest.raises(ValueError, match="schema contract violation"):
        w(
            spark.createDataFrame(
                [(2, "delta epsilon zeta", 7)],
                "doc_id bigint, text string, lang bigint",
            ),
            1,
        )


def test_gate_schema_cache_folds_additive_columns(spark, tmp_path):
    """The per-process contract cache (txpair._CONTRACT_SCHEMAS) must
    (a) spare the per-trigger TxTable.read() once warm, and (b) fold
    a PASSING batch's additive columns into the cached contract so a
    later batch dropping them refuses — strictly stronger than the
    one-footer read it replaces, which missed drops of post-footer
    additive columns."""
    from unittest import mock

    from eeg_data_lake_spark.streaming import txpair

    tbl = TxTable(spark, os.path.join(str(tmp_path), "cachegate"))
    tbl.append(spark.createDataFrame([(1, "a")], "doc_id bigint, v string"))

    base = spark.createDataFrame([(2, "b")], "doc_id bigint, v string")
    txpair.contract_gate(tbl, base)  # cold: populates the cache
    with mock.patch.object(
        TxTable, "read", side_effect=AssertionError("cache miss")
    ):
        txpair.contract_gate(tbl, base)  # warm: no read()

    widened = spark.createDataFrame(
        [(3, "c", 1.5)], "doc_id bigint, v string, extra double"
    )
    # additive passes, but the fold is DEFERRED to the returned
    # callable (round-8 ADVICE: a failed append must not leave phantom
    # columns in the cache) — before invoking it, dropping 'extra'
    # still passes...
    fold = txpair.contract_gate(tbl, widened)
    txpair.contract_gate(tbl, base)
    # ...and after the simulated append commit, it refuses
    tbl.append(widened)
    fold()
    with pytest.raises(ValueError, match="dropped"):
        txpair.contract_gate(tbl, base)


def test_gate_fold_skipped_on_append_failure(spark, tmp_path):
    """A batch whose additive columns pass the gate but whose APPEND
    then fails must leave the cached contract untouched: the next
    base-schema batch is legitimate (the table never widened) and has
    to pass. The eager-fold version of the gate falsely refused it
    until process restart."""
    from eeg_data_lake_spark.streaming import txpair

    tbl = TxTable(spark, os.path.join(str(tmp_path), "failgate"))
    tbl.append(spark.createDataFrame([(1, "a")], "doc_id bigint, v string"))
    base = spark.createDataFrame([(2, "b")], "doc_id bigint, v string")
    widened = spark.createDataFrame(
        [(3, "c", 1.5)], "doc_id bigint, v string, extra double"
    )
    txpair.contract_gate(tbl, base)  # warm the cache
    fold = txpair.contract_gate(tbl, widened)
    del fold  # append failed: the fold callable is never invoked
    txpair.contract_gate(tbl, base)  # must NOT raise


def test_overwrite_auto_invalidates_contract_cache(spark, tmp_path):
    """An in-process schema rewrite (TxTable.overwrite) must not
    strand the process-wide contract cache: txlog's ON_REWRITE hook
    calls invalidate_contract automatically, so the next gate reads
    the fresh schema instead of falsely refusing until restart. The
    manual hook remains for OUT-OF-BAND rewrites (another process) —
    simulated here by re-planting a stale cache entry."""
    from eeg_data_lake_spark.streaming import txpair

    path = os.path.join(str(tmp_path), "rewrite")
    tbl = TxTable(spark, path)
    tbl.append(spark.createDataFrame([(1, "a")], "doc_id bigint, v string"))
    base = spark.createDataFrame([(2, "b")], "doc_id bigint, v string")
    txpair.contract_gate(tbl, base)  # cache the old contract
    wide_schema = txpair._CONTRACT_SCHEMAS[path]

    slim = spark.createDataFrame([(9,)], "doc_id bigint")
    tbl.overwrite(slim)  # rewrite fires ON_REWRITE -> cache dropped
    assert path not in txpair._CONTRACT_SCHEMAS
    fold = txpair.contract_gate(tbl, slim)  # fresh read: passes
    fold()

    # out-of-band rewrite (no in-process overwrite): stale entry
    # refuses until the manual hook clears it
    txpair._CONTRACT_SCHEMAS[path] = wide_schema
    with pytest.raises(ValueError, match="dropped"):
        txpair.contract_gate(tbl, slim)
    txpair.invalidate_contract(path)
    fold = txpair.contract_gate(tbl, slim)
    fold()
