"""Streaming ANN index maintenance: cells match the batch assignment,
probes prune files via txlog stats, probe results equal a brute-force
rescan of the probed cells, and replayed batches are no-ops."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.annindex import (
    cell_of,
    index_batch_writer,
    probe_topk,
)
from eeg_data_lake_spark.workload.similarity import as_double, dot, l2norm

K_CELLS = 8
DIM = 16


def _cents():
    rng = np.random.default_rng(7)
    c = rng.standard_normal((K_CELLS, DIM))
    return (c / np.linalg.norm(c, axis=1, keepdims=True)).round(6).tolist()


def _vecs(spark, lo, hi, seed):
    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(DIM).round(6)])
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable(spark, str(tmp_path / "annidx"))


def test_streaming_index_matches_batch_assignment(spark, table):
    cents = _cents()
    writer = index_batch_writer(table, cents, "ann")
    writer(_vecs(spark, 0, 60, 1), 0)
    writer(_vecs(spark, 60, 100, 2), 1)

    idx = table.read()
    assert idx.count() == 100
    # the streamed cell column equals a fresh batch assignment
    fresh = _vecs(spark, 0, 60, 1).unionByName(_vecs(spark, 60, 100, 2)).select(
        "vec_id", cell_of(as_double(F.col("embedding")), cents).alias("cell")
    )
    got = {r.vec_id: r.cell for r in idx.select("vec_id", "cell").collect()}
    want = {r.vec_id: r.cell for r in fresh.collect()}
    assert got == want

    # replay of batch 1 is a no-op (exactly-once)
    v = table.version()
    writer(_vecs(spark, 60, 100, 2), 1)
    assert table.version() == v and table.read().count() == 100


def test_probe_prunes_files_and_matches_rescan(spark, table):
    cents = _cents()
    writer = index_batch_writer(table, cents, "ann")
    writer(_vecs(spark, 0, 80, 3), 0)
    writer(_vecs(spark, 80, 160, 4), 1)

    # file pruning: one cell's probe must touch fewer files than exist
    all_files = len(table._replay().files)
    one_cell = len(table.matching_files([("cell", "=", 0)]))
    assert 0 < one_cell < all_files

    q = list(np.random.default_rng(9).standard_normal(DIM).round(6))
    got = [(r.vec_id, r.cosine) for r in probe_topk(table, q, cents, nprobe=3, k=5).collect()]

    # oracle: brute-force cosine over exactly the probed cells
    qn = np.asarray(q) / np.linalg.norm(q)
    probes = set(np.argsort(-(np.asarray(cents) @ qn))[:3].tolist())
    full = table.read()
    qcol = F.array(*[F.lit(float(x)) for x in qn.tolist()])
    e = as_double(F.col("embedding"))
    want = [
        (r.vec_id, r.cosine)
        for r in full.filter(F.col("cell").isin([int(p) for p in probes]))
        .select("vec_id", (dot(e, qcol) / l2norm(e)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
        .collect()
    ]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


def test_text_to_index_to_retrieval_end_to_end(spark, tmp_path):
    """U4 -> §2.8 integration: raw TEXT micro-batches run through the
    REAL hashed-ngram encoder, the embeddings stream into the IVF
    txlog index, and a probe with a fresh query string retrieves the
    planted near-duplicate text first — the full text -> embedding ->
    online-index -> ANN-retrieval loop with no stub anywhere."""
    from eeg_data_lake_spark.functions.embed import (
        EMBED_DIM,
        _encode_batch,
        _make_projection,
        with_text_embedding,
    )

    rng = np.random.default_rng(11)
    c = rng.standard_normal((K_CELLS, EMBED_DIM))
    cents = (c / np.linalg.norm(c, axis=1, keepdims=True)).round(6).tolist()
    table = TxTable(spark, str(tmp_path / "textidx"))
    writer = index_batch_writer(table, cents, "textann")

    target = "the quick brown fox jumps over the lazy dog again and again"
    batch1 = [(0, "completely unrelated pelican filament text"),
              (1, target),
              (2, "spark structured streaming with watermarks")]
    batch2 = [(3, "duckdb oracle parity and value hashing"),
              (4, "another unrelated document about nothing")]
    for bid, rows in enumerate((batch1, batch2)):
        df = spark.createDataFrame(rows, "vec_id long, text string")
        emb = with_text_embedding(df).select(
            "vec_id", as_double(F.col("embedding")).alias("embedding")
        )
        writer(emb, bid)
    assert table.read().count() == 5

    query = "the quick brown fox jumps over the lazy cat again and again"
    qv = _encode_batch(
        np.array([query]), EMBED_DIM, _make_projection(EMBED_DIM)
    )[0].tolist()
    # nprobe=K_CELLS makes the probe exhaustive -> rank-1 must be the
    # planted near-dup regardless of which cell it landed in
    top = probe_topk(table, qv, cents, nprobe=K_CELLS, k=2).collect()
    assert top[0].vec_id == 1, top
    assert top[0].cosine > 0.8, top
    assert top[1].cosine < top[0].cosine - 0.2, top
