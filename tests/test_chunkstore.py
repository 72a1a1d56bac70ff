"""Content-addressed chunk store: byte-identical reconstruction,
single-instancing of shared chunks, version supersession, GC reclaim
arithmetic, replay idempotence, and missing-chunk surfacing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.chunking import cdc_cut_points
from eeg_data_lake_spark.sources.chunkstore import ChunkStore


def _blobdf(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, payload binary")


def _payload(n, seed=7):
    out, block = bytearray(), seed.to_bytes(8, "little")
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n])


def _unique_chunks(payloads) -> dict[str, int]:
    out: dict[str, int] = {}
    for data in payloads:
        cuts = cdc_cut_points(data)
        for a, b in zip(cuts, cuts[1:]):
            out.setdefault(hashlib.md5(data[a:b]).hexdigest(), b - a)
    return out


@pytest.fixture()
def corpus():
    shared = _payload(3000, seed=1)
    return {
        1: shared + _payload(500, seed=2),
        2: _payload(400, seed=3) + shared,  # shares a long region with 1
        3: _payload(900, seed=4),
        4: b"",  # empty doc must round-trip
        5: None,  # NULL payload stores as empty
    }


def test_put_reconstruct_roundtrip_and_single_instancing(
    spark, tmp_path, corpus
):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, list(corpus.items())), txn_id="p0")

    got = {
        r.doc_id: (bytes(r.payload), r.missing_chunks, r.n_bytes)
        for r in store.reconstruct().collect()
    }
    assert set(got) == set(corpus)
    for did, data in corpus.items():
        want = data or b""
        assert got[did][0] == want, did  # byte-identical
        assert got[did][1] == 0  # nothing missing
        assert got[did][2] == len(want)

    # the store holds exactly one row per unique chunk across docs —
    # the shared region between docs 1 and 2 is stored once
    want_chunks = _unique_chunks(v or b"" for v in corpus.values())
    rows = store.chunks.read().collect()
    assert {r.chunk_md5: r.length for r in rows} == want_chunks
    for r in rows:  # stored bytes really are the chunk content
        assert hashlib.md5(bytes(r.data)).hexdigest() == r.chunk_md5

    rep = store.storage_report().collect()[0]
    assert rep.n_docs == len(corpus)
    assert rep.stored_bytes == sum(want_chunks.values())
    assert rep.logical_bytes == sum(len(v or b"") for v in corpus.values())
    assert rep.stored_bytes < rep.logical_bytes  # dedup did work


def test_put_replay_is_noop(spark, tmp_path, corpus):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    blobs = _blobdf(spark, list(corpus.items()))
    store.put(blobs, txn_id="p0")
    versions = (store.chunks.version(), store.manifests.version())
    store.put(blobs, txn_id="p0")  # crash-replay of the same batch
    assert (store.chunks.version(), store.manifests.version()) == versions


def test_reput_supersedes_and_gc_reclaims_old_version(spark, tmp_path):
    base = _payload(4000, seed=11)
    edited = _payload(64, seed=12) + base[1000:]  # drops a 1000-byte prefix
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, [(1, base)]), txn_id="v1")
    store.put(_blobdf(spark, [(1, edited)]), txn_id="v2")

    # one live manifest; reconstruct returns the NEW bytes
    assert store.manifests.read().count() == 1
    rec = store.reconstruct().collect()[0]
    assert bytes(rec.payload) == edited and rec.missing_chunks == 0

    # v1-only chunks are garbage; gc's report must match the set math
    live_set = _unique_chunks([edited])
    all_set = _unique_chunks([base, edited])
    report = store.gc(txn_id="gc1").collect()[0]
    assert report.chunks_before == len(all_set)
    assert report.chunks_after == len(live_set)
    assert report.chunks_dropped == len(all_set) - len(live_set)
    assert report.bytes_reclaimed == sum(all_set.values()) - sum(
        live_set.values()
    )
    assert {
        r.chunk_md5 for r in store.chunks.read().collect()
    } == set(live_set)

    # the live doc still reconstructs from the compacted store
    rec = store.reconstruct().collect()[0]
    assert bytes(rec.payload) == edited and rec.missing_chunks == 0


def test_delete_then_gc_preserves_survivors(spark, tmp_path, corpus):
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, list(corpus.items())), txn_id="p0")
    store.delete_docs(F.col("doc_id").isin(1, 3), txn_id="d0")

    survivors = {k: v for k, v in corpus.items() if k not in (1, 3)}
    want_live = _unique_chunks(v or b"" for v in survivors.values())
    report = store.gc(txn_id="gc0").collect()[0]
    assert report.chunks_after == len(want_live)
    assert report.chunks_dropped > 0  # doc 3's unique chunks died
    got = {
        r.doc_id: (bytes(r.payload), r.missing_chunks)
        for r in store.reconstruct().collect()
    }
    assert set(got) == set(survivors)
    for did, data in survivors.items():
        assert got[did] == (data or b"", 0)

    # gc replay: the overwrite no-ops, nothing double-reclaimed
    v = store.chunks.version()
    again = store.gc(txn_id="gc0").collect()[0]
    assert store.chunks.version() == v
    assert again.chunks_dropped == 0


def test_missing_chunks_surface_not_truncate(spark, tmp_path):
    data = _payload(3000, seed=21)
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, [(1, data)]), txn_id="p0")
    # simulate a lost store row (e.g. a gc racing a concurrent put)
    damaged = store.chunks.read().orderBy("chunk_md5").limit(
        store.chunks.read().count() - 1
    )
    store.chunks.overwrite(damaged, txn_id="damage")
    rec = store.reconstruct().collect()[0]
    assert rec.missing_chunks == 1
    assert rec.payload is None  # NULL, never a silently truncated blob


def test_z25_report_is_self_verifying(spark, sf_dir):
    from eeg_data_lake_spark.workload import REGISTRY

    rows = REGISTRY["z25_chunkstore_lifecycle"].spark_fn(
        spark, sf_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.docs_put > 0 and r.docs_live < r.docs_put
    assert r.chunks_after == r.chunks_before - r.chunks_dropped
    assert r.chunks_dropped > 0 and r.bytes_reclaimed > 0
    assert r.reconstruct_mismatches == 0
    assert r.missing_refs == 0


def test_put_replay_completes_after_mid_put_crash(spark, tmp_path, corpus):
    """Crash between the chunks commit and the manifests MERGE: the
    replay must detect the committed chunk leg (has_txn), skip the
    probe, and complete the manifest write — with no duplicate chunk
    rows."""
    store = ChunkStore(spark, str(tmp_path / "cs"))
    blobs = _blobdf(spark, list(corpus.items()))
    # the manifest leg's COMMIT is the crash point (its data files are
    # staged concurrently with the chunk leg's, but staged files are
    # invisible orphans until commit_staged — the crash window is
    # between the two manifest-link commits, exactly as before)
    real_commit = store.manifests.commit_staged
    store.manifests.commit_staged = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash")
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        store.put(blobs, txn_id="p0")
    store.manifests.commit_staged = real_commit
    assert store.chunks.version() >= 0  # first leg landed
    assert store.manifests.version() == -1  # second leg did not

    store.put(blobs, txn_id="p0")  # replay heals
    assert store.chunks.read().count() == len(
        _unique_chunks(v or b"" for v in corpus.values())
    )
    got = {
        r.doc_id: bytes(r.payload) for r in store.reconstruct().collect()
    }
    assert got == {k: (v or b"") for k, v in corpus.items()}


def test_bucketed_put_replay_survives_mid_put_crash(spark, tmp_path):
    """The bucketed flavor of the crash-replay: the committed chunk leg
    bumped the store version past the projection snapshot, so a replay
    that re-probed would refuse the projection as stale — it must skip
    the probe instead and complete the MERGE."""
    import uuid

    base = f"cs_replay_{uuid.uuid4().hex[:8]}"
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, [(1, _payload(2000, 1))]), txn_id="p0")
    store.bucketize(base, n_buckets=4)
    try:
        blobs = _blobdf(spark, [(2, _payload(700, 2))])
        real_commit = store.manifests.commit_staged
        store.manifests.commit_staged = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected crash")
        )
        with pytest.raises(RuntimeError, match="injected crash"):
            store.put(blobs, txn_id="p1", bucketed=base)
        store.manifests.commit_staged = real_commit

        store.put(blobs, txn_id="p1", bucketed=base)  # must not raise
        got = {
            r.doc_id: r.missing_chunks
            for r in store.reconstruct().collect()
        }
        assert got == {1: 0, 2: 0}
    finally:
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith(base):
                spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")


def test_delete_docs_null_predicate_rows_survive(spark, tmp_path, corpus):
    """Three-valued logic: a predicate that evaluates to NULL (here:
    first chunk hash of an EMPTY manifest) must count as non-matching —
    the row survives the delete instead of being silently dropped."""
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, list(corpus.items())), txn_id="p0")
    first_hash_of_doc3 = store.manifests.read().filter(
        F.col("doc_id") == 3
    ).select(F.get("chunk_md5s", 0)).collect()[0][0]
    # NULL for docs 4 (empty) and 5 (NULL payload): empty hash arrays
    store.delete_docs(
        F.get("chunk_md5s", 0) == F.lit(first_hash_of_doc3), txn_id="d0"
    )
    assert {r.doc_id for r in store.manifests.read().collect()} == {
        1, 2, 4, 5
    }


def test_concurrency_duplicated_chunk_row_never_corrupts(
    spark, tmp_path, corpus
):
    """txlog's optimistic concurrency lets two racing put() calls both
    append the same novel chunk (each probed a snapshot lacking it).
    The duplicated store row must degrade to over-storage only:
    reconstruction stays byte-identical (no join fan-out concatenating
    the chunk twice), accounting counts hashes distinctly, and gc()
    heals the physical duplication."""
    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, list(corpus.items())), txn_id="p0")

    # simulate the race: re-append one existing chunk row verbatim
    dup = store.chunks.read().orderBy("chunk_md5").limit(1)
    n_before = store.chunks.read().count()
    store.chunks.append(dup, txn_id="race")
    assert store.chunks.read().count() == n_before + 1

    got = {
        r.doc_id: (bytes(r.payload), r.missing_chunks)
        for r in store.reconstruct().collect()
    }
    for did, data in corpus.items():
        assert got[did] == ((data or b""), 0), did

    rep = store.storage_report().collect()[0]
    assert rep.n_unique_chunks == n_before  # distinct by hash
    dup_len = dup.collect()[0].length
    want_bytes = sum(
        _unique_chunks(v or b"" for v in corpus.values()).values()
    )
    assert rep.stored_bytes == want_bytes + dup_len  # physically stored

    # gc heals: duplicate row reclaimed, everything still referenced
    gcrep = store.gc(txn_id="gc0").collect()[0]
    assert gcrep.chunks_before == n_before + 1
    assert gcrep.chunks_dropped == 1
    assert gcrep.bytes_reclaimed == dup_len
    assert store.chunks.read().count() == n_before
    got2 = {
        r.doc_id: bytes(r.payload) for r in store.reconstruct().collect()
    }
    assert got2 == {d: (v or b"") for d, v in corpus.items()}


def test_gc_does_not_poison_session_serialization(spark, tmp_path):
    """Spark 4.1 hazard pin: classic.SparkSession.observationManager is
    a LAZY val of a non-serializable class. The first Observation used
    in a session materializes it, and from then on ANY closure that
    captures the session fails task serialization — the visible victim
    is MLlib, whose fitted models carry a trainingSummary holding the
    session into their transform UDF (NotSerializableException:
    ObservationManager). gc() once used df.observe() for its reclaim
    stats and broke every later-in-session model.transform; this test
    runs the exact sequence that failed (gc, then fit + transform +
    evaluate on the SAME session)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    store = ChunkStore(spark, str(tmp_path / "cs"))
    store.put(_blobdf(spark, [(1, _payload(4000, seed=11))]), txn_id="v1")
    store.put(_blobdf(spark, [(1, _payload(64, seed=12))]), txn_id="v2")
    store.gc(txn_id="gc1").collect()

    d = spark.createDataFrame(
        [(0.0, 0.1, 0.2), (1.0, 0.9, 0.8)] * 10,
        "label double, f1 double, f2 double",
    )
    feats = VectorAssembler(
        inputCols=["f1", "f2"], outputCol="features"
    ).transform(d)
    pred = LogisticRegression().fit(feats).transform(feats)
    acc = MulticlassClassificationEvaluator(metricName="accuracy").evaluate(
        pred
    )
    assert acc == 1.0
