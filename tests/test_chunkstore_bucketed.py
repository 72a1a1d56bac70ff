"""Bucketed chunk-store projection: the put probe and the
reconstruction join read the store with ZERO store-side exchange
(bucket i vs bucket i), results stay identical to the txlog path, and
stale projections are refused rather than silently mis-probed."""

from __future__ import annotations

import hashlib
import uuid

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.chunking import chunk_rows
from eeg_data_lake_spark.plans import count_exchanges, join_strategies
from eeg_data_lake_spark.sources.chunkstore import ChunkStore


@pytest.fixture(autouse=True)
def _plan_shape_no_spread(monkeypatch):
    """Plan pins in this module document the AT-SCALE plan shape,
    where the scale-adaptive input rebalance (operators/spread.py) is
    identity by its own gate — so pin with it off rather than encode
    the local one-row-group artifact into every exchange count.
    Result-parity THROUGH the spread path is covered by
    tests/test_spread.py and the oracle-parity sweep."""
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")


def _payload(n, seed=7):
    out, block = bytearray(), seed.to_bytes(8, "little")
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n])


def _blobdf(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, payload binary")


@pytest.fixture()
def base(spark):
    name = f"cs_bkt_{uuid.uuid4().hex[:8]}"
    yield name
    for tbl in spark.catalog.listTables():
        if tbl.name.startswith(name):
            spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")


def _batch_chunks(blobs):
    rows = chunk_rows(blobs, with_data=True)
    return rows.groupBy("chunk_md5").agg(
        F.min("length").alias("length"), F.first("data").alias("data")
    )


def test_bucketed_probe_is_store_side_shuffle_free(
    spark, tmp_path, base
):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    shared = _payload(2500, seed=1)
    store.put(
        _blobdf(spark, [(1, shared + _payload(400, 2))]), txn_id="p0"
    )
    store.bucketize(base, n_buckets=4)

    batch = _batch_chunks(
        _blobdf(spark, [(2, _payload(300, 3) + shared)])
    )
    # apples-to-apples: both sides merge-hinted (at scale the store is
    # never broadcastable), the ONLY difference is bucketed storage
    plain = batch.join(
        store.chunks.read().select("chunk_md5").hint("merge"),
        "chunk_md5",
        "left_anti",
    )
    bucketed = batch.join(
        store._known_hashes(base), "chunk_md5", "left_anti"
    )
    assert "SortMergeJoin" in join_strategies(bucketed)
    # the bucketed plan drops exactly the store-side exchange
    assert count_exchanges(bucketed) == count_exchanges(plain) - 1
    # and probes identically
    assert sorted(r.chunk_md5 for r in bucketed.collect()) == sorted(
        r.chunk_md5 for r in plain.collect()
    )


def test_bucketed_put_matches_plain_put(spark, tmp_path, base):
    shared = _payload(3000, seed=11)
    batches = [
        [(1, shared + _payload(500, 12)), (2, _payload(900, 13))],
        [(3, _payload(200, 14) + shared), (4, b""), (5, None)],
    ]
    plain = ChunkStore(spark, str(tmp_path / "plain"))
    bkt = ChunkStore(spark, str(tmp_path / "bkt"))
    for i, pairs in enumerate(batches):
        plain.put(_blobdf(spark, pairs), txn_id=f"p{i}")
    bkt.put(_blobdf(spark, batches[0]), txn_id="p0")
    bkt.bucketize(base, n_buckets=4)
    bkt.put(_blobdf(spark, batches[1]), txn_id="p1", bucketed=base)

    want = {
        (r.chunk_md5, r.length)
        for r in plain.chunks.read().collect()
    }
    got = {(r.chunk_md5, r.length) for r in bkt.chunks.read().collect()}
    assert got == want  # same unique-chunk set, nothing re-appended
    rec = {
        r.doc_id: bytes(r.payload) for r in bkt.reconstruct().collect()
    }
    for did, data in [p for pairs in batches for p in pairs]:
        assert rec[did] == (data or b"")


def test_bucketed_reconstruct_drops_store_exchange(
    spark, tmp_path, base
):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    blobs = _blobdf(
        spark,
        [(i, _payload(1500 + 97 * i, seed=i)) for i in range(1, 6)],
    )
    store.put(blobs, txn_id="p0")
    store.bucketize(base, n_buckets=4)

    # at 100 TB the store side cannot broadcast; disable the local
    # broadcast shortcut so the plain path shows its at-scale SMJ plan
    key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        plain = store.reconstruct()
        bucketed = store.reconstruct(bucketed=base)
        # store side co-located: only the exploded-manifest shuffle and
        # the per-doc reassembly shuffle remain
        assert count_exchanges(plain) == 3
        assert count_exchanges(bucketed) == 2
        assert "SortMergeJoin" in join_strategies(bucketed)
    finally:
        spark.conf.set(key, saved)

    want = {r.doc_id: bytes(r.payload) for r in blobs.collect()}
    got = {
        r.doc_id: (bytes(r.payload), r.missing_chunks)
        for r in bucketed.collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == 0 for v in got.values())


def test_stale_projection_is_refused_then_refresh_recovers(
    spark, tmp_path, base
):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, [(1, _payload(2000, 1))]), txn_id="p0")
    old = store.bucketize(base, n_buckets=4)
    # a new put bumps the store version -> projection is now stale
    store.put(_blobdf(spark, [(2, _payload(800, 2))]), txn_id="p1")
    with pytest.raises(ValueError, match="missing or stale"):
        store.put(
            _blobdf(spark, [(3, _payload(100, 3))]),
            txn_id="p2",
            bucketed=base,
        )
    with pytest.raises(ValueError, match="missing or stale"):
        store.reconstruct(bucketed=base)

    new = store.bucketize(base, n_buckets=4)
    assert new != old
    assert not store.spark.catalog.tableExists(old)  # superseded drop
    rec = {
        r.doc_id: r.missing_chunks
        for r in store.reconstruct(bucketed=base).collect()
    }
    assert rec == {1: 0, 2: 0}


def test_bucketize_empty_store_raises(spark, tmp_path, base):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    with pytest.raises(ValueError, match="empty store"):
        store.bucketize(base)
