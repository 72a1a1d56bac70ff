"""The shared two-table exactly-once commit discipline for the
streaming ingest family: a corpus table plus a companion index table,
committed corpus-FIRST then index, each under its own batch-keyed txn
id.

Every incremental ingest in this package maintains that pair —
MinHash-LSH bands (streaming/dedup.py), ExactSubstr grams
(streaming/exactsubstr.py), SimHash blocks (streaming/simhash.py),
CDC chunks (streaming/chunkdedup.py) — and previously each hand-rolled
the same ordering + naming + crash argument. This module is the single
implementation; the crash matrix is property-tested ONCE centrally
(tests/test_txpair.py) instead of re-argued per ingest.

The crash argument, stated once:

- foreachBatch is at-least-once, so any batch may replay after a
  driver crash. Both commits carry DISTINCT txn ids keyed to the batch
  (a shared id would make the index leg no-op on replay after a crash
  between the two commits, losing the index rows forever).
- Corpus first: a crash between the legs leaves the index LAGGING the
  corpus — the probe is then conservative only in the ACCEPTING
  direction, and exactly for rows whose corpus commit already no-ops
  on its txn id, so the corpus can never double-admit. The replay then
  completes the index leg with identical content (index commits are
  strictly ordered behind their corpus commits, so the index state the
  batch derived against cannot have advanced).
- An index leading the corpus (index-first) would REJECT rows the
  corpus never accepted — data loss — which is why the order is fixed
  here rather than a parameter.

``index_missing`` + the per-ingest backfills close the OTHER gap in
that argument: a corpus seeded outside the stream (batch bootstrap, a
plain txsink ingest, a pre-index run) has rows but no index, and
without a backfill the first probe would admit every near-duplicate of
a seeded doc forever, with no warning.

sources/chunkstore.py's put() deliberately INVERTS the order (content
chunks first, manifests second): there the reader-facing invariant is
"a live manifest's chunks always resolve", so the leg that must never
lead is the manifest. streaming/incremental.py needs no pair at all —
its maintenance folds into ONE table per commit, with state recovered
from the sink's own log.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from eeg_data_lake_spark.sources.txlog import TxTable


def batch_txn(sink_id: str, batch_id: int) -> str:
    """The corpus-leg txn id every paired ingest uses."""
    return f"{sink_id}:batch-{batch_id}"


def index_txn(sink_id: str, tag: str, batch_id: int) -> str:
    """The index-leg txn id: ``tag`` names the index family (bands,
    grams, blocks, chunks) so one sink can maintain several."""
    return f"{sink_id}:{tag}-{batch_id}"


def index_missing(table: TxTable, idx: TxTable) -> bool:
    """True when the corpus has rows but its companion index is absent
    — the seeded-outside-the-stream case the backfills must close."""
    return table.version() >= 0 and idx.version() < 0


def backfill_index(
    table: TxTable,
    idx: TxTable,
    rows_fn: Callable[[DataFrame], DataFrame],
    sink_id: str,
    tag: str,
) -> bool:
    """If the corpus was seeded outside the stream (``index_missing``),
    append ``rows_fn(corpus)`` to the index under a dedicated
    ``{sink_id}:{tag}-backfill`` txn id, exactly-once. Returns whether
    a backfill ran.

    Safe for SET-semantics indices (bands, blocks, chunk hashes):
    if the index is instead absent because the FIRST batch crashed
    between its two commits, the backfill covers that batch's corpus
    rows and the replayed index leg then derives an empty/duplicate-
    free delta against it — same final index content. COUNT-semantics
    indices (ExactSubstr gram counts) must exclude the currently
    replaying batch from the seed themselves before calling this, or
    the batch's rows would be counted by both the backfill and the
    replayed index leg (see streaming/exactsubstr.py).
    """
    if not index_missing(table, idx):
        return False
    idx.append(rows_fn(table.read()), txn_id=f"{sink_id}:{tag}-backfill")
    return True


def paired_commit(
    table: TxTable,
    corpus_df: DataFrame | Callable[[], DataFrame],
    idx: TxTable,
    index_df: DataFrame | Callable[[], DataFrame],
    sink_id: str,
    tag: str,
    batch_id: int,
) -> None:
    """Commit one micro-batch to the (corpus, index) pair under the
    shared discipline: corpus append first under ``batch_txn``, index
    append second under ``index_txn``. Either leg may be a zero-arg
    callable, invoked only if that leg has not already committed —
    replays then skip the leg's (possibly expensive) derivation, not
    just its write."""
    if not table.has_txn(batch_txn(sink_id, batch_id)):
        df = corpus_df() if callable(corpus_df) else corpus_df
        table.append(df, txn_id=batch_txn(sink_id, batch_id))
    if not idx.has_txn(index_txn(sink_id, tag, batch_id)):
        df = index_df() if callable(index_df) else index_df
        idx.append(df, txn_id=index_txn(sink_id, tag, batch_id))
