"""Incremental streaming near-dup ingestion vs a python union-find
reference: batch-by-batch greedy dedup semantics, cross-batch novelty
against the accepted corpus, and exactly-once replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.dedup import (
    stream_dedup_ingest,
    with_bands,
)

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


@pytest.fixture()
def batches(spark, sf_dir, tmp_path):
    """Two micro-batch files with planted within- and cross-batch dups."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    b0 = docs.filter(F.col("doc_id") < 40)
    b1_fresh = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80))
    # cross-batch dups: batch-0 texts under new ids -> must be rejected
    cross = (
        docs.filter(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + 1000)
    )
    # within-batch dups: two copies of one batch-1 text under new ids
    within = (
        docs.filter(F.col("doc_id") == 40)
        .withColumn("doc_id", F.col("doc_id") + 2000)
    )
    b1 = b1_fresh.unionByName(cross).unionByName(within)
    import os

    src = tmp_path / "incoming"
    src.mkdir()
    for i, frame in enumerate((b0, b1)):
        stage = tmp_path / f"stage_{i}"
        frame.coalesce(1).write.parquet(str(stage))
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(str(stage / part), str(src / f"batch_{i}.parquet"))
    return str(src), [b0, b1]


def _reference_accept(batch_band_rows):
    """Greedy per-batch dedup: union-find on shared bands within the
    batch, min-doc_id representative per cluster, reject reps whose
    band matches any previously accepted doc's same-position band."""
    accepted_ids, acc_b0, acc_b1 = set(), set(), set()
    for rows in batch_band_rows:
        parent = {r.doc_id: r.doc_id for r in rows}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for col in ("band0", "band1"):
            by_band = {}
            for r in rows:
                by_band.setdefault(getattr(r, col), []).append(r.doc_id)
            for ids in by_band.values():
                for other in ids[1:]:
                    parent[find(other)] = find(ids[0])
        reps = {}
        for r in rows:
            root = find(r.doc_id)
            if root not in reps or r.doc_id < reps[root].doc_id:
                reps[root] = r
        for r in reps.values():
            if r.band0 in acc_b0 or r.band1 in acc_b1:
                continue
            accepted_ids.add(r.doc_id)
            acc_b0.add(r.band0)
            acc_b1.add(r.band1)
    return accepted_ids


def test_stream_dedup_matches_reference_and_is_exactly_once(
    spark, batches, tmp_path
):
    src, frames = batches
    table = TxTable(spark, str(tmp_path / "accepted"))
    ckpt = str(tmp_path / "ckpt")
    stream_dedup_ingest(
        spark, src, SCHEMA, table, ckpt, sink_id="dedup-ingest"
    )
    assert table.version() == 1  # one commit per micro-batch

    want = _reference_accept(
        [with_bands(df).collect() for df in frames]
    )
    got = {r.doc_id for r in table.read().collect()}
    assert got == want
    # planted dups actually exercised the three rejection paths
    assert not any(i >= 1000 for i in got if i < 2000)  # cross-batch dup
    assert len([i for i in got if i >= 2000]) == 0  # within-batch copy of 40
    assert 40 in got

    # replay: rerunning the drained stream (same checkpoint) and a
    # manually replayed batch txn are both no-ops
    stream_dedup_ingest(
        spark, src, SCHEMA, table, ckpt, sink_id="dedup-ingest"
    )
    assert table.version() == 1
    assert {r.doc_id for r in table.read().collect()} == want


def test_short_documents_still_dedup(spark, tmp_path):
    """<3-token docs have no shingles → NULL minhash bands; without the
    content-hash fallback they bypass dedup entirely and byte-identical
    short docs are all accepted. The fallback bands must collide them."""
    from eeg_data_lake_spark.sources.txlog import TxTable
    from eeg_data_lake_spark.streaming.dedup import (
        _batch_representatives,
        with_bands,
    )

    docs = spark.createDataFrame(
        [
            (1, "hi there"),          # 2 tokens — no shingles
            (2, "hi there"),          # byte-identical short dup
            (3, "bye now"),           # distinct short doc
            (4, "a much longer document with plenty of tokens here"),
        ],
        "doc_id long, text string",
    )
    banded = with_bands(docs)
    assert banded.filter(F.col("band0").isNull()).count() == 0
    survivors = {r.doc_id for r in _batch_representatives(banded).collect()}
    assert survivors == {1, 3, 4}  # doc 2 deduped against doc 1


def test_band_index_tracks_corpus_and_replays_safely(spark, tmp_path):
    """The companion band index must equal the distinct bands of the
    accepted corpus after multi-batch ingest, and the two-table commit
    must converge under batch replay (crash between the two appends)."""
    from eeg_data_lake_spark.sources.txlog import TxTable
    from eeg_data_lake_spark.streaming.dedup import (
        band_index_table,
        dedup_batch_writer,
        with_bands,
    )

    table = TxTable(spark, str(tmp_path / "corpus"))
    process = dedup_batch_writer(table, "t")

    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(3, "alpha beta gamma delta"), (4, "iota kappa lambda mu")],
        "doc_id long, text string",
    )
    process(b0, 0)
    process(b1, 1)
    process(b1, 1)  # full replay of a committed batch: must be a no-op

    accepted = {r.doc_id for r in table.read().collect()}
    assert accepted == {1, 2, 4}  # doc 3 deduped against doc 1

    bands = band_index_table(spark, table)
    got = {
        (r.band_col, r.band) for r in bands.read().distinct().collect()
    }
    want = set()
    for r in with_bands(table.read().select("doc_id", "text")).collect():
        want.add(("band0", r.band0))
        want.add(("band1", r.band1))
    assert got == want

    # crash window: corpus committed, bands append lost → replay fills
    # the index without duplicating corpus rows
    v_corpus, v_bands = table.version(), bands.version()
    process(b1, 1)
    assert table.version() == v_corpus
    assert bands.version() == v_bands  # txn-keyed: replay is a no-op too


def test_null_text_documents_still_dedup(spark, tmp_path):
    """md5(NULL) is NULL: without the text coalesce, NULL-text docs got
    NULL bands and bypassed dedup forever (equi-joins drop NULL keys).
    They must band together (with each other and with empty text)."""
    from eeg_data_lake_spark.streaming.dedup import dedup_batch_writer

    table = TxTable(spark, str(tmp_path / "corpus"))
    writer = dedup_batch_writer(table, sink_id="nulltext")
    b0 = spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, None, "en", "s", 0)], SCHEMA
    )
    writer(b0, 0)
    # within-batch: the two NULL-text docs collide, one representative
    assert {r.doc_id for r in table.read().collect()} == {1}
    b1 = spark.createDataFrame(
        [(3, None, "en", "s", 0), (4, "", "en", "s", 0)], SCHEMA
    )
    writer(b1, 1)
    # cross-batch: NULL and "" both rejected against the accepted doc
    assert {r.doc_id for r in table.read().collect()} == {1}


def test_seeded_corpus_bands_backfilled_before_first_probe(
    spark, tmp_path
):
    """A corpus seeded outside this writer (batch bootstrap) has no
    band index; the first streamed batch must backfill it so near-dups
    of seeded docs are rejected, not admitted forever."""
    from eeg_data_lake_spark.streaming.dedup import (
        band_index_table,
        dedup_batch_writer,
    )

    table = TxTable(spark, str(tmp_path / "corpus"))
    table.append(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon", "en", "s", 31)], SCHEMA
        ),
        txn_id="bootstrap",
    )
    writer = dedup_batch_writer(table, sink_id="seeded")
    dup_of_seed = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon", "en", "s", 31),
            (101, "zeta eta theta iota kappa", "en", "s", 25),
        ],
        SCHEMA,
    )
    writer(dup_of_seed, 0)
    assert {r.doc_id for r in table.read().collect()} == {1, 101}
    idx = band_index_table(spark, table)
    n_banded = idx.read().count()
    assert n_banded >= 4  # seed's 2 bands backfilled + 101's 2 bands
    # replaying the batch (crash recovery) stays exactly-once
    writer(dup_of_seed, 0)
    assert {r.doc_id for r in table.read().collect()} == {1, 101}
    assert idx.read().count() == n_banded


def test_copy_flood_collapses_before_pair_join(spark, tmp_path, monkeypatch):
    """Thousands of exact copies in one micro-batch share ONE
    (band0, band1) signature — the within-batch skew. The
    identical-signature pre-collapse must keep the collision self-join
    at one row per distinct signature (never the O(n^2) clique) and
    skip the iterative per-trigger CC entirely when the collapsed reps
    don't collide, while staying exact: one survivor per copy group,
    distinct docs untouched, a later re-flood rejected by the index."""
    import random

    import eeg_data_lake_spark.streaming.dedup as sd
    from eeg_data_lake_spark.streaming.dedup import dedup_batch_writer

    def boom(*a, **k):
        raise AssertionError(
            "connected_components must not run on a collapse-clean batch"
        )

    monkeypatch.setattr(sd, "connected_components", boom)

    rng = random.Random(11)
    words = [f"w{i}" for i in range(4000)]
    rows = [
        (i, "the same templated boilerplate text", "en", "s", 35)
        for i in range(2000)
    ]
    rows += [
        (10_000 + i, " ".join(rng.sample(words, 12)), "en", "s", 60)
        for i in range(25)
    ]
    table = TxTable(spark, str(tmp_path / "corpus"))
    writer = dedup_batch_writer(table, "flood")
    writer(spark.createDataFrame(rows, SCHEMA), 0)
    accepted = {r.doc_id for r in table.read().collect()}
    assert accepted == {0} | {10_000 + i for i in range(25)}

    # a later flood of the same copy is rejected wholesale by the
    # band-index probe — and still never wakes the iterative CC
    flood = [
        (50_000 + i, "the same templated boilerplate text", "en", "s", 35)
        for i in range(500)
    ] + [(60_000, " ".join(rng.sample(words, 12)), "en", "s", 60)]
    writer(spark.createDataFrame(flood, SCHEMA), 1)
    assert {r.doc_id for r in table.read().collect()} == accepted | {60_000}


def test_deep_chain_batch_hits_explicit_cc_bound(spark):
    """A planted band-collision PATH (doc i ~ doc i+1, all signatures
    distinct so the exact-dup collapse can't shortcut it) needs
    diameter-many CC rounds: an explicit max_cc_rounds below that must
    RAISE loudly (the q48 contract) instead of silently burning
    rounds, and the default bound must resolve the same batch to its
    min-doc representative."""
    from eeg_data_lake_spark.streaming.dedup import _batch_representatives

    n = 8  # path graph, diameter 7
    rows = [
        (
            i,
            f"E{i if i % 2 == 0 else i - 1}",
            f"O{i if i % 2 == 1 else i - 1}",
        )
        for i in range(n)
    ]
    banded = spark.createDataFrame(
        rows, "doc_id bigint, band0 string, band1 string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        _batch_representatives(banded, max_cc_rounds=2).collect()
    kept = {
        r.doc_id for r in _batch_representatives(banded).collect()
    }
    assert kept == {0}  # one component, min-doc representative
