"""Exact all-pairs cosine scoring with a corpus-size cutover.

Embedding-cosine near-dup needs every pair (a, b) with
cosine(a, b) >= tau. Two exact physical strategies, chosen by corpus
size (the ANN paths — LSH q93 / IVF q99 — are the *approximate* scale
path; this operator is the exact one, and the recall oracle for them):

- **broadcast matmul** (n <= ``broadcast_cutover``): collect the
  corpus once (n x d doubles — MBs up to ~100k vectors), closure-
  broadcast it, and score each partition against it with one numpy
  matmul. No shuffle at all.
- **block-pair matmul** (n above the cutover): hash every vector into
  one of B blocks of ~``rows_per_block`` rows, build the tiny
  B*(B+1)/2 block-pair table, replicate each block to the pairs it
  participates in (one shuffle of n*B rows — the standard distributed
  all-pairs layout), and matmul each block pair in an
  ``applyInPandas`` task. Task memory is bounded by
  2 * rows_per_block * d doubles regardless of n, so the plan
  survives any corpus the cluster can shuffle; compute stays the
  inherent O(n^2 d) of the exact problem.

Both strategies emit identical rows: (vec_a < vec_b, cosine rounded
to 6) — covered by one DuckDB oracle and a path-equivalence test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: above this many vectors the corpus is no longer driver/closure-sized
BROADCAST_CUTOVER = 100_000

#: block-path sizing: ~2 * rows * dim * 8 bytes of numpy per task
ROWS_PER_BLOCK = 20_000


def _pairs_from_sims(ids_a, ids_b, sims, tau, same_block):
    """Thresholded (vec_a, vec_b, cosine) rows from a sim matrix;
    vec_a < vec_b enforced, self/duplicate pairs dropped."""
    ai, bi = np.where(sims >= tau)
    a, b = ids_a[ai], ids_b[bi]
    if same_block:
        keep = a < b
    else:
        keep = a != b
    a, b, s = a[keep], b[keep], sims[ai[keep], bi[keep]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pd.DataFrame(
        {"vec_a": lo, "vec_b": hi, "cosine": np.round(s, 6)}
    )


def cosine_neardup_pairs(
    v: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_cutover: int = BROADCAST_CUTOVER,
    rows_per_block: int = ROWS_PER_BLOCK,
) -> DataFrame:
    """All pairs with cosine >= ``tau`` as (vec_a, vec_b, cosine),
    vec_a < vec_b, cosine rounded to 6. Exact — no candidate
    pruning — with the physical plan picked by corpus size."""
    # NULL/empty embeddings can never clear tau and would crash the
    # numpy paths (np.array over a ragged/object list) with an opaque
    # executor error — dropped at entry, like ml/kmeans.py
    v = v.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    # one EAGER localCheckpoint pins a consistent snapshot for every
    # downstream evaluation: the sizing count, the broadcast-path
    # collect, and the returned lazy plan's scans all read the same
    # materialized rows — required for correctness when the upstream
    # is nondeterministic (unseeded sample, rand()-derived columns) or
    # a live table, and it cuts lineage so nothing recomputes. Unlike
    # an explicit persist() with no unpersist (the round-2 leak), the
    # checkpoint blocks are reclaimed by the ContextCleaner as soon as
    # the returned DataFrame is garbage-collected. On a cluster, lost
    # executors lose non-reliable checkpoint blocks (job restart);
    # swap for reliable checkpoint(dir) if that matters at your scale.
    v = v.localCheckpoint(eager=True)
    n = v.count()
    if n <= broadcast_cutover:
        return _broadcast_matmul_pairs(v, tau)
    n_blocks = max(2, -(-n // rows_per_block))
    return _block_pair_matmul_pairs(v, tau, n_blocks)


def _broadcast_matmul_pairs(v: DataFrame, tau: float) -> DataFrame:
    """Small-corpus fast path: one collect, zero shuffles."""
    rows = v.collect()
    if not rows:
        # empty corpus: zero pairs (norm over a 0-row matrix would
        # raise AxisError before any guard downstream)
        return v.sparkSession.createDataFrame(
            [], "vec_a long, vec_b long, cosine double"
        )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    # norm floored at 1e-12: a zero vector normalizes to zeros (cosine
    # 0 vs everything) instead of poisoning whole score rows with NaN
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            x = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
            own = pdf["vec_id"].to_numpy(dtype=np.int64)
            sims = x @ mat.T
            # same_block=False semantics but with a < filter: each pair
            # appears once because only the (row-side id < corpus id)
            # orientation is kept
            ai, bi = np.where(sims >= tau)
            keep = own[ai] < ids[bi]
            yield pd.DataFrame(
                {
                    "vec_a": own[ai[keep]],
                    "vec_b": ids[bi[keep]],
                    "cosine": np.round(sims[ai[keep], bi[keep]], 6),
                }
            )

    return v.mapInPandas(score, schema="vec_a long, vec_b long, cosine double")


def _block_pair_matmul_pairs(v: DataFrame, tau: float, n_blocks: int) -> DataFrame:
    """Large-corpus path: hash-blocked pairwise matmul, driver never
    sees the data."""
    spark = v.sparkSession
    blocks = v.withColumn(
        "block", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    )
    pair_rows = [
        (i, j) for i in range(n_blocks) for j in range(n_blocks) if i <= j
    ]
    pairs = spark.createDataFrame(pair_rows, "ba int, bb int")
    # replicate each block to every pair it is a member of; tag which
    # side of the matmul the row belongs to
    side_a = blocks.join(F.broadcast(pairs), blocks.block == pairs.ba).select(
        "ba", "bb", F.lit(0).alias("side"), "vec_id", "embedding"
    )
    side_b = (
        blocks.join(F.broadcast(pairs), blocks.block == pairs.bb)
        .filter(F.col("ba") != F.col("bb"))
        .select("ba", "bb", F.lit(1).alias("side"), "vec_id", "embedding")
    )
    replicated = side_a.unionByName(side_b)

    def score(key, pdf):
        ba, bb = key
        a = pdf[pdf["side"] == 0]
        ids_a = a["vec_id"].to_numpy(dtype=np.int64)
        if ba == bb:
            ids_b = ids_a
        else:
            b = pdf[pdf["side"] == 1]
            ids_b = b["vec_id"].to_numpy(dtype=np.int64)
        # emptiness guard BEFORE normalization: a one-sided group's
        # empty (0,)-shaped matrix makes norm(axis=1) raise AxisError
        if not len(ids_a) or not len(ids_b):
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        xa = np.array(a["embedding"].tolist(), dtype=np.float64)
        xa = xa / np.maximum(np.linalg.norm(xa, axis=1, keepdims=True), 1e-12)
        if ba == bb:
            xb, same = xa, True
        else:
            xb = np.array(b["embedding"].tolist(), dtype=np.float64)
            xb = xb / np.maximum(np.linalg.norm(xb, axis=1, keepdims=True), 1e-12)
            same = False
        return _pairs_from_sims(ids_a, ids_b, xa @ xb.T, tau, same)

    return replicated.groupBy("ba", "bb").applyInPandas(
        score, schema="vec_a long, vec_b long, cosine double"
    )
