"""Incremental CDC chunk-store ingestion: index ≡ batch chunking of
the ingested corpus, exactly-once replay convergence, and the
storage-dedup property that re-ingesting edited blobs costs only the
edited regions."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.chunking import cdc_cut_points
from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.chunkdedup import (
    chunk_batch_writer,
    chunk_index_table,
    dedup_report,
    stream_chunk_ingest,
)


def _expected_index(payload_by_doc: dict[int, bytes]) -> dict[str, int]:
    """chunk_md5 -> length over the union, one entry per unique chunk."""
    out: dict[str, int] = {}
    for _, data in sorted(payload_by_doc.items()):
        cuts = cdc_cut_points(data)
        for a, b in zip(cuts, cuts[1:]):
            out.setdefault(hashlib.md5(data[a:b]).hexdigest(), b - a)
    return out


def test_stream_chunk_ingest_index_matches_batch_chunking(
    spark, sf_dir, tmp_path
):
    import os

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    ).filter(F.col("doc_id") < 120)
    src = tmp_path / "incoming"
    src.mkdir()
    frames = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    for i, frame in enumerate(frames):
        stage = tmp_path / f"stage_{i}"
        frame.coalesce(1).write.parquet(str(stage))
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(str(stage / part), str(src / f"batch_{i}.parquet"))

    table = TxTable(spark, str(tmp_path / "corpus"))
    ckpt = str(tmp_path / "ckpt")
    stream_chunk_ingest(
        spark, src := str(src), "doc_id bigint, payload binary",
        table, ckpt, sink_id="chunk-ingest",
    )
    assert table.version() == 1  # one corpus commit per micro-batch

    payloads = {
        r.doc_id: bytes(r.payload) if r.payload is not None else b""
        for r in docs.collect()
    }
    want = _expected_index(payloads)
    idx = chunk_index_table(spark, table)
    got = {r.chunk_md5: r.length for r in idx.read().collect()}
    assert got == want  # one row per unique chunk, correct lengths

    # every corpus doc landed (blobs are never rejected)
    assert table.read().count() == len(payloads)

    # the report adds up against the same ground truth
    rep = dedup_report(table).collect()[0]
    assert rep.n_unique_chunks == len(want)
    assert rep.stored_bytes == sum(want.values())
    assert rep.logical_bytes == sum(len(p) for p in payloads.values())
    assert rep.n_docs == len(payloads)
    # real cross-doc chunk sharing exists in the testdata
    assert rep.stored_bytes < rep.logical_bytes

    # replay: rerunning the drained stream is a no-op everywhere
    v_c, v_i = table.version(), idx.version()
    stream_chunk_ingest(
        spark, src, "doc_id bigint, payload binary", table, ckpt,
        sink_id="chunk-ingest",
    )
    assert (table.version(), idx.version()) == (v_c, v_i)
    assert {r.chunk_md5: r.length for r in idx.read().collect()} == want


def test_edited_reingest_costs_only_edited_regions(spark, tmp_path):
    """Version 2 of a blob (17 bytes prepended to 5 KB) must add only
    the few chunks around the edit — CDC boundary resynchronization
    doing storage-dedup work online."""
    def payload(n, seed=7):
        out, block = bytearray(), seed.to_bytes(8, "little")
        while len(out) < n:
            block = hashlib.md5(block).digest()
            out.extend(block)
        return bytes(out[:n])

    base = payload(5000)
    edited = payload(17, seed=99) + base
    table = TxTable(spark, str(tmp_path / "corpus"))
    process = chunk_batch_writer(table, "t")
    process(
        spark.createDataFrame([(1, base)], "doc_id long, payload binary"), 0
    )
    idx = chunk_index_table(spark, table)
    n0 = idx.read().count()
    process(
        spark.createDataFrame([(2, edited)], "doc_id long, payload binary"), 1
    )
    added = idx.read().count() - n0
    assert n0 >= 5  # multiple chunks, so the claim is meaningful
    assert 1 <= added <= 3, added  # only the edit region re-stored

    # crash window: corpus committed, index append lost → replay heals
    v_c, v_i = table.version(), idx.version()
    process(
        spark.createDataFrame([(2, edited)], "doc_id long, payload binary"), 1
    )
    assert (table.version(), idx.version()) == (v_c, v_i)


def test_z24_report_runs(spark, sf_dir):
    from eeg_data_lake_spark.workload import REGISTRY

    rep = REGISTRY["z24_streaming_chunk_ingest"].spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_docs > 0 and r.n_unique_chunks > 0
    assert r.stored_bytes <= r.logical_bytes
    assert r.dedup_ratio >= 1.0


def test_seeded_corpus_chunks_backfilled_before_first_probe(
    spark, tmp_path
):
    """A corpus seeded outside this writer has no chunk index; the
    first streamed batch must backfill it (first_batch = -1 marks the
    seed provenance) so the "one row per unique chunk ever ingested"
    invariant and the dedup report cover the seed, and seed-shared
    chunks are not re-stored as novel."""
    pay = {1: b"A" * 700 + b"B" * 700}
    table = TxTable(spark, str(tmp_path / "corpus"))
    table.append(
        spark.createDataFrame(
            list(pay.items()), "doc_id long, payload binary"
        ),
        txn_id="bootstrap",
    )
    writer = chunk_batch_writer(table, sink_id="seeded")
    # doc 2 repeats doc 1's content exactly: every chunk already seeded
    batch = spark.createDataFrame(
        [(2, pay[1]), (3, b"C" * 900)], "doc_id long, payload binary"
    )
    writer(batch, 0)
    idx = chunk_index_table(spark, table)
    assert idx.has_txn("seeded:chunks-backfill")
    rows = idx.read().collect()
    want = _expected_index({1: pay[1], 3: b"C" * 900})
    assert {r.chunk_md5: r.length for r in rows} == want
    # seed-only chunks carry the -1 provenance; doc 2 added none
    by_batch = {r.chunk_md5: r.first_batch for r in rows}
    seed_chunks = set(_expected_index({1: pay[1]}))
    assert all(by_batch[c] == -1 for c in seed_chunks)
    assert all(
        b == 0 for c, b in by_batch.items() if c not in seed_chunks
    )
    n_rows = len(rows)
    # replaying the batch (crash recovery) stays exactly-once
    writer(batch, 0)
    assert idx.read().count() == n_rows
    assert table.read().count() == 3


def test_crashed_first_batch_replay_keeps_batch_provenance(
    spark, tmp_path
):
    """A FIRST batch that crashed between its corpus and index legs is
    already in the corpus when the replay runs; the seed backfill must
    exclude it (its docs anti-joined out), so its chunks carry
    first_batch=batch_id exactly as in an uncrashed run — never the
    seed's -1."""
    batch = spark.createDataFrame(
        [(1, b"A" * 700 + b"B" * 700), (2, b"C" * 900)],
        "doc_id long, payload binary",
    )

    def run(name, crash):
        table = TxTable(spark, str(tmp_path / name))
        writer = chunk_batch_writer(table, sink_id=name)
        if crash:
            # simulate: corpus leg landed, index leg did not
            table.append(batch, txn_id=f"{name}:batch-0")
        writer(batch, 0)  # the (re)play
        return table

    clean = run("cl", crash=False)
    crashed = run("cr", crash=True)
    rows_c = {
        (r.chunk_md5, r.length, r.first_doc_id, r.first_batch)
        for r in chunk_index_table(spark, clean).read().collect()
    }
    rows_x = {
        (r.chunk_md5, r.length, r.first_doc_id, r.first_batch)
        for r in chunk_index_table(spark, crashed).read().collect()
    }
    assert rows_c == rows_x
    assert all(b == 0 for *_, b in rows_c)
    assert clean.read().count() == crashed.read().count() == 2
