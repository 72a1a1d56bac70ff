"""Streaming ANN index maintenance: vectors arrive continuously and
each micro-batch is indexed into a transaction-logged IVF layout —
the online form of the batch ANN builds (q99/z02/z03), and the piece
that turns "an ANN query" into "an ANN *service* over a growing
corpus".

Per batch (foreachBatch, exactly-once via txn-id):

1. **Assign** every vector its IVF cell — the same JVM dot-product
   expressions as q99 (seeded spherical centroids, fixed at index
   creation; retraining the quantizer is a rebuild, exactly as in
   FAISS).
2. **Cluster the write**: repartition by cell and sort within
   partitions, so each parquet file covers a narrow cell range and
   the txlog's per-file min/max stats make cell probes prune files
   (the poor-man's partition pruning that needs no directory layout).
3. **Append** to the corpus TxTable with ``txn_id = (sink, batch)``
   — replays are no-ops.

Probing reads ONLY the files whose [min, max] cell interval covers a
probed cell (``TxTable.read(predicates=...)``), then scores exact
cosine inside the pruned set — candidates shrink ~K/nprobe-fold
before any vector math, and the scan cost shrinks with them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.workload.similarity import as_double, dot, l2norm


def cell_of(vec_col, cents: list[list[float]]):
    """IVF cell id (int) for an embedding column: argmax over centroid
    dot products — all JVM expressions, identical to q99's assignment."""
    dots = F.array(
        *[dot(vec_col, F.array(*[F.lit(x) for x in c])) for c in cents]
    )
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def index_batch_writer(
    table: TxTable,
    cents: list[list[float]],
    sink_id: str,
    n_files: int = 16,
):
    """foreachBatch function: assign cells, cluster files by cell,
    append exactly-once.

    ``n_files`` is passed to repartition EXPLICITLY: an explicit
    partition count is exempt from AQE's partition coalescing, which
    would otherwise merge a small batch into one file whose cell
    min/max spans everything — destroying the stats-based probe
    pruning this layout exists for. Size it ≥ the cell count so most
    files cover a single cell."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        indexed = batch_df.select(
            "vec_id",
            "embedding",
            cell_of(as_double(F.col("embedding")), cents).alias("cell"),
        )
        # narrow cell range per output file → tight min/max footer
        # stats → the probe's predicate pruning actually drops files.
        # Range partitioning, NOT hash: hash scatters unrelated cell
        # ids into one partition (cells {2, 14} co-located → that
        # file's min/max spans 2..14 and every probe in between reads
        # it); ranges keep each file's cell interval contiguous.
        clustered = indexed.repartitionByRange(
            n_files, "cell"
        ).sortWithinPartitions("cell")
        table.append(clustered, txn_id=f"{sink_id}:batch-{batch_id}")

    return process


def probe_topk(
    table: TxTable,
    query_vec: list[float],
    cents: list[list[float]],
    nprobe: int = 4,
    k: int = 5,
) -> DataFrame:
    """Top-k nearest (cosine) to ``query_vec`` scanning only the
    probed cells' files. Exact within the probed cells."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)  # zero query -> zero scores, not NaN
    probes = np.argsort(-(np.asarray(cents) @ qn))[:nprobe].tolist()

    parts = [
        table.read(predicates=[("cell", "=", int(c))]) for c in probes
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    qcol = F.array(*[F.lit(float(x)) for x in qn.tolist()])
    e = as_double(F.col("embedding"))
    scored = corpus.select(
        "vec_id",
        F.when(l2norm(e) > 0, dot(e, qcol) / l2norm(e)).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
