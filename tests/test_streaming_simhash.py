"""Incremental streaming SimHash near-dup ingestion vs an EXHAUSTIVE
python reference: batch-by-batch greedy Hamming dedup semantics,
cross-batch novelty against the accepted corpus's block index, and
exactly-once replay.

The reference does all-pairs Hamming union-find (no Manku pigeonhole
shortcut), so equality also re-proves the block join misses no pair
within the radius on real data — the same guarantee the batch r41
oracle pins, here for the online path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.simhash import (
    block_index_table,
    simhash_batch_writer,
    stream_simhash_ingest,
)
from eeg_data_lake_spark.workload.dedup import simhash_block_rows, with_simhash

SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _ham(a: tuple[int, int], b: tuple[int, int]) -> int:
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


def _reference_accept(batch_fp_rows, max_hamming: int = 3) -> set[int]:
    """Greedy per-batch dedup, exhaustively: union-find on ALL pairs
    within the Hamming radius inside the batch, min-doc_id
    representative per component, reject representatives within the
    radius of ANY previously accepted fingerprint."""
    accepted_ids: set[int] = set()
    accepted_fps: list[tuple[int, int]] = []
    for rows in batch_fp_rows:
        fp = {r.doc_id: (r.fp_hi, r.fp_lo) for r in rows}
        parent = {i: i for i in fp}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ids = sorted(fp)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if _ham(fp[a], fp[b]) <= max_hamming:
                    parent[find(b)] = find(a)
        reps: dict[int, int] = {}
        for i in ids:
            r = find(i)
            reps[r] = min(reps.get(r, i), i)
        for rid in sorted(reps.values()):
            if any(_ham(fp[rid], acc) <= max_hamming for acc in accepted_fps):
                continue
            accepted_ids.add(rid)
            accepted_fps.append(fp[rid])
    return accepted_ids


@pytest.fixture()
def batches(spark, sf_dir, tmp_path):
    """Two micro-batch files with planted within- and cross-batch
    exact copies (Hamming 0 — the guaranteed-in-radius case; any
    mutated-text pairs that land in 1..3 are covered by the
    reference-equality assertion rather than planted)."""
    import os

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    b0 = docs.filter(F.col("doc_id") < 40)
    b1_fresh = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 80))
    cross = (
        docs.filter(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + 1000)
    )
    within = (
        docs.filter(F.col("doc_id") == 40)
        .withColumn("doc_id", F.col("doc_id") + 2000)
    )
    b1 = b1_fresh.unionByName(cross).unionByName(within)

    src = tmp_path / "incoming"
    src.mkdir()
    for i, frame in enumerate((b0, b1)):
        stage = tmp_path / f"stage_{i}"
        frame.coalesce(1).write.parquet(str(stage))
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(str(stage / part), str(src / f"batch_{i}.parquet"))
    return str(src), [b0, b1]


def test_stream_simhash_matches_reference_and_is_exactly_once(
    spark, batches, tmp_path
):
    src, frames = batches
    table = TxTable(spark, str(tmp_path / "accepted"))
    ckpt = str(tmp_path / "ckpt")
    stream_simhash_ingest(
        spark, src, SCHEMA, table, ckpt, sink_id="simhash-ingest"
    )
    assert table.version() == 1  # one commit per micro-batch

    fp_rows = [
        with_simhash(df).select("doc_id", "fp_hi", "fp_lo").collect()
        for df in frames
    ]
    want = _reference_accept(fp_rows)
    got = {r.doc_id for r in table.read().collect()}
    assert got == want

    # the planted exact copies exercised both rejection paths (their
    # originals are accepted on this data, so Hamming 0 must reject)
    originals = {r.doc_id for r in frames[0].collect() if r.doc_id < 5}
    assert originals <= got
    assert not any(1000 <= i < 1005 for i in got)  # cross-batch copies
    assert 2040 not in got and 40 in got  # within-batch copy of doc 40

    # greedy-accept invariant: the accepted set is mutually > radius
    fps = {
        r.doc_id: (r.fp_hi, r.fp_lo)
        for rows in fp_rows
        for r in rows
        if r.doc_id in got
    }
    ids = sorted(fps)
    assert all(
        _ham(fps[a], fps[b]) > 3
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    )

    # replay: rerunning the drained stream (same checkpoint) is a no-op
    stream_simhash_ingest(
        spark, src, SCHEMA, table, ckpt, sink_id="simhash-ingest"
    )
    assert table.version() == 1
    assert {r.doc_id for r in table.read().collect()} == want


def test_block_index_tracks_corpus_and_replays_safely(spark, tmp_path):
    """The companion block index must equal the block rows of the
    accepted corpus after multi-batch ingest, and the two-table commit
    must converge under batch replay (crash between the two appends)."""
    table = TxTable(spark, str(tmp_path / "corpus"))
    process = simhash_batch_writer(table, "t")

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
    assert accepted == {1, 2, 4}  # doc 3 (exact copy) deduped vs doc 1

    idx = block_index_table(spark, table)
    got = {
        (r.doc_id, r.j, r.block, r.fp_hi, r.fp_lo)
        for r in idx.read().collect()
    }
    want_fps = with_simhash(table.read().select("doc_id", "text"))
    want = {
        (r.doc_id, r.j, r.block, r.fp_hi, r.fp_lo)
        for r in simhash_block_rows(
            want_fps.select("doc_id", "fp_hi", "fp_lo")
        ).collect()
    }
    assert got == want
    assert len(got) == 3 * 4  # exactly 4 block rows per accepted doc

    # crash window: corpus committed, index append lost → replay fills
    # the index without duplicating corpus rows
    v_corpus, v_idx = table.version(), idx.version()
    process(b1, 1)
    assert table.version() == v_corpus
    assert idx.version() == v_idx  # txn-keyed: replay is a no-op too


def test_degenerate_short_docs_collapse_to_one(spark):
    """<3-token docs have no shingles → the zero fingerprint: ALL of
    them mutually collide at Hamming 0 and the batch keeps exactly one
    representative — the r41-oracle-implied policy (documented; filter
    empties upstream via expectations when unwanted)."""
    from eeg_data_lake_spark.streaming.simhash import _batch_representatives

    docs = spark.createDataFrame(
        [
            (1, "hi there"),  # 2 tokens — no shingles → fp 0
            (2, "bye now"),  # distinct text, also fp 0
            (3, "a much longer document with plenty of tokens in it"),
        ],
        "doc_id long, text string",
    )
    fps = with_simhash(docs)
    assert {
        (r.doc_id, r.fp_hi, r.fp_lo)
        for r in fps.select("doc_id", "fp_hi", "fp_lo").collect()
        if r.doc_id in (1, 2)
    } == {(1, 0, 0), (2, 0, 0)}
    survivors = {r.doc_id for r in _batch_representatives(fps, 3).collect()}
    assert 1 in survivors and 2 not in survivors and 3 in survivors


def test_cross_batch_near_duplicate_rejected(spark, tmp_path):
    """The index probe must reject a NEAR duplicate (Hamming 1..3,
    not byte-identical) arriving in a later batch: plants a one-token
    mutation of an accepted doc whose fingerprint provably lands
    within the radius (searched at test time among token dropouts —
    single-token edits of a long doc flip few majority votes), and a
    far mutation that must survive."""
    base_tokens = [f"tok{i}" for i in range(60)]
    base = " ".join(base_tokens)
    # candidate near-dups: drop one token each
    cands = [
        (100 + k, " ".join(base_tokens[:k] + base_tokens[k + 1 :]))
        for k in range(40)
    ]
    fps = {
        r.doc_id: (r.fp_hi, r.fp_lo)
        for r in with_simhash(
            spark.createDataFrame(
                [(0, base)] + cands, "doc_id long, text string"
            )
        ).collect()
    }
    near = next(
        (
            i
            for i, _ in cands
            if 1 <= _ham(fps[0], fps[i]) <= 3
        ),
        None,
    )
    assert near is not None, "no dropout landed at Hamming 1..3"
    near_text = dict(cands)[near]
    far_text = " ".join(f"other{i}" for i in range(60))

    table = TxTable(spark, str(tmp_path / "corpus"))
    process = simhash_batch_writer(table, "near")
    process(
        spark.createDataFrame([(0, base)], "doc_id long, text string"), 0
    )
    process(
        spark.createDataFrame(
            [(near, near_text), (999, far_text)],
            "doc_id long, text string",
        ),
        1,
    )
    accepted = {r.doc_id for r in table.read().collect()}
    assert near not in accepted  # near-dup caught by block probe + verify
    assert accepted == {0, 999}


def test_seeded_corpus_blocks_backfilled_before_first_probe(
    spark, tmp_path
):
    """A corpus seeded outside this writer (batch bootstrap, plain
    ingest) has no block index; the first streamed batch must backfill
    it so near-dups of seeded docs are rejected, not admitted forever
    (the guard streaming/dedup.py already had, mirrored here)."""
    table = TxTable(spark, str(tmp_path / "corpus"))
    table.append(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta", "en", "s", 35)],
            SCHEMA,
        ),
        txn_id="bootstrap",
    )
    writer = simhash_batch_writer(table, sink_id="seeded")
    batch = spark.createDataFrame(
        [
            # exact copy of the seed: Hamming 0, must be rejected
            (100, "alpha beta gamma delta epsilon zeta", "en", "s", 35),
            (101, "nu xi omicron pi rho sigma tau", "en", "s", 29),
        ],
        SCHEMA,
    )
    writer(batch, 0)
    assert {r.doc_id for r in table.read().collect()} == {1, 101}
    idx = block_index_table(spark, table)
    # 4 block rows per doc: seed (backfilled) + the accepted novel doc
    n_rows = idx.read().count()
    assert n_rows == 8
    assert idx.has_txn("seeded:blocks-backfill")
    # replaying the batch (crash recovery) stays exactly-once
    writer(batch, 0)
    assert {r.doc_id for r in table.read().collect()} == {1, 101}
    assert idx.read().count() == n_rows


def test_planted_degenerate_skew_bounded_and_exact(spark, tmp_path):
    """Thousands of degenerate (<3-token) docs all map to fingerprint
    0 and land in the SAME Manku blocks — the hot-block skew. The
    identical-fp pre-collapse must keep the batch join bounded (the
    block index never accumulates the zero block: at most one zero-fp
    doc is ever accepted) while staying EXACT: kept = min doc_id of
    each component, same as the exhaustive reference."""
    n_degen = 2000
    rows = [(i, "x" if i % 2 else "", "en", "s", 1) for i in range(n_degen)]
    rows += [
        (5000, "alpha beta gamma delta epsilon", "en", "s", 30),
        (5001, "one two three four five six", "en", "s", 27),
        (5002, "alpha beta gamma delta epsilon", "en", "s", 30),
    ]
    table = TxTable(spark, str(tmp_path / "corpus"))
    writer = simhash_batch_writer(table, sink_id="skew")
    writer(spark.createDataFrame(rows, SCHEMA), 0)
    accepted = {r.doc_id for r in table.read().collect()}
    # every degenerate doc collapses to doc 0; 5002 loses to 5000
    assert accepted == {0, 5000, 5001}

    # the index holds 4 block rows per ACCEPTED doc only — the
    # degenerate hot block is bounded at one doc's rows forever
    idx = block_index_table(spark, table)
    zero_rows = (
        idx.read()
        .filter((F.col("fp_hi") == 0) & (F.col("fp_lo") == 0))
        .count()
    )
    assert zero_rows == 4
    assert idx.read().count() == 12

    # a later degenerate flood is rejected wholesale by the probe
    # against those 4 rows, never re-growing the block
    flood = [
        (10_000 + i, "", "en", "s", 0) for i in range(500)
    ] + [(20_000, "seven eight nine ten eleven twelve", "en", "s", 33)]
    writer(spark.createDataFrame(flood, SCHEMA), 1)
    assert {r.doc_id for r in table.read().collect()} == {
        0, 5000, 5001, 20_000,
    }
    assert idx.read().count() == 16


def test_identical_fp_collapse_matches_exhaustive_reference(spark, tmp_path):
    """Mixed batch (degenerate group + real texts with planted exact
    copies) must equal the exhaustive all-pairs union-find reference —
    the pre-collapse is an optimization, not a semantics change."""
    texts = [
        (0, ""), (1, ""), (2, "y"),
        (3, "alpha beta gamma delta epsilon"),
        (4, "alpha beta gamma delta epsilon"),
        (5, "one two three four five"),
        (6, "red green blue cyan magenta"),
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in texts]
    df = spark.createDataFrame(rows, SCHEMA)
    table = TxTable(spark, str(tmp_path / "corpus"))
    simhash_batch_writer(table, sink_id="mix")(df, 0)
    got = {r.doc_id for r in table.read().collect()}
    fp_rows = [with_simhash(df).select("doc_id", "fp_hi", "fp_lo").collect()]
    assert got == _reference_accept(fp_rows)


def test_hot_block_cap_drops_only_capped_blocks(spark):
    """max_block_df drops over-populated (j, block) buckets from
    candidate generation (recall-only trade); blocks under the cap
    keep probing."""
    from eeg_data_lake_spark.streaming.simhash import cross_batch_hits

    # 50 distinct indexed fps share block (j=3, 1): fp_lo = 1 + k<<16
    # differs in the j=2 block only
    idx_rows = [(100 + k, 0, (k << 16) | 1, 3, 1) for k in range(50)]
    # one more indexed fp reachable through an UNcapped block
    idx_rows.append((999, 0, (7 << 16) | 2, 3, 2))
    idx = spark.createDataFrame(
        idx_rows, "doc_id long, fp_hi long, fp_lo long, j int, block int"
    )
    probe = spark.createDataFrame(
        [
            # within hamming 3 of doc 100 (fp_lo 1 vs 1): matches only
            # via the capped block (j=3, 1)
            (1, 0, 1, 3, 1),
            # exact match of doc 999 via the uncapped (j=3, 2) block
            (2, 0, (7 << 16) | 2, 3, 2),
        ],
        "doc_id long, fp_hi long, fp_lo long, j int, block int",
    )
    uncapped = cross_batch_hits(probe, [idx], 3)
    assert {r.doc_id for r in uncapped.collect()} == {1, 2}
    capped = cross_batch_hits(probe, [idx], 3, max_block_df=10)
    assert {r.doc_id for r in capped.collect()} == {2}


def test_cross_batch_hits_empty_frames_returns_empty(spark):
    """Exported helper contract: an empty frames list (index has no
    rows yet) yields an empty doc_id frame, not an AttributeError —
    callers must not need an `if frames:` guard."""
    from eeg_data_lake_spark.streaming.simhash import cross_batch_hits

    probe = spark.createDataFrame(
        [(1, 0, 1, 3, 1)],
        "doc_id long, fp_hi long, fp_lo long, j int, block int",
    )
    out = cross_batch_hits(probe, [], 3)
    assert out.columns == ["doc_id"]
    assert out.count() == 0


def test_deep_chain_batch_hits_explicit_cc_bound(spark):
    """A planted Hamming-chain (fp_i = 8 set bits sliding by 1, so
    consecutive fps verify at hamming 2 while fps two apart are at 4 —
    all fingerprints distinct, so the identical-fp collapse can't
    shortcut it) needs diameter-many CC rounds: an explicit
    max_cc_rounds below the chain's diameter must RAISE loudly, and
    the default bound must resolve the batch to its min-doc rep."""
    from eeg_data_lake_spark.streaming.simhash import (
        _batch_representatives,
    )

    n = 10
    rows = [(i, 0, 0xFF << i) for i in range(n)]
    fps = spark.createDataFrame(
        rows, "doc_id bigint, fp_hi bigint, fp_lo bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        _batch_representatives(fps, 3, max_cc_rounds=2).collect()
    kept = {
        r.doc_id for r in _batch_representatives(fps, 3).collect()
    }
    assert kept == {0}
