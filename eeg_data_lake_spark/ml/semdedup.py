"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): cluster the corpus with k-means,
then within each cluster greedily suppress items whose cosine to an
already-retained item exceeds a threshold. Catches paraphrase-level
duplication that shingle/MinHash n-gram dedup (q33-q35) cannot see.

Spark decomposition:

1. **Cluster** — the existing distributed Lloyd's k-means
   (ml/kmeans.py): per round one Arrow-batched assignment pass and one
   (cluster, dim) partial-average shuffle; only k×d floats reach the
   driver.
2. **Within-cluster NMS** — one ``applyInPandas`` per cluster runs the
   greedy retention scan in ascending-id priority order: an item is
   dropped iff its cosine to some already-RETAINED earlier item is
   ≥ tau (the non-maximum-suppression rule; a chain a~b~c with
   a·c < tau keeps a AND c, unlike the drop-if-any-earlier-neighbor
   rule which would over-drop c).

Scale: the pairwise work is confined to each cluster — O(Σ n_c²)
instead of O(n²) — which is the entire point of SemDeDup: k is chosen
so n_c stays task-sized (the paper uses n_c ≈ 10⁴ at web scale; grow
k linearly with the corpus). The cluster shuffle is one exchange on a
dense int key; skew means an overfull cluster, which is a quantizer
problem (raise k), not a join problem.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of semdedup_flags
FLAGS_SCHEMA = (
    "vec_id long, cluster int, kept boolean, max_kept_cosine double"
)


def _nms_scan(ids: np.ndarray, X: np.ndarray, tau: float):
    """Greedy retention in ascending-id order over one cluster.

    Returns (sorted_ids, kept_mask, max_kept_cosine) where
    max_kept_cosine[i] is item i's best cosine against the retained
    set at its decision point (NaN for the first item). Zero-norm
    vectors are clamped (norm floored at 1e-12) so they normalize to
    the zero vector: cosine 0 against everything, hence always kept
    and never suppressing later items — without the clamp a 0/0 NaN
    would propagate through the running max and wrongly flag every
    subsequent item in the cluster as a duplicate."""
    order = np.argsort(ids)
    ids_s = ids[order]
    Xn = X[order]
    norms = np.linalg.norm(Xn, axis=1, keepdims=True)
    Xn = Xn / np.maximum(norms, 1e-12)
    sims = Xn @ Xn.T
    n = len(ids_s)
    kept = np.zeros(n, dtype=bool)
    best = np.full(n, np.nan)
    kept_idx: list[int] = []
    for i in range(n):
        if kept_idx:
            best[i] = sims[i, kept_idx].max()
        if not kept_idx or best[i] < tau:
            kept[i] = True
            kept_idx.append(i)
    return ids_s, kept, best


def semdedup_flags(
    assigned: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Per-vector retention decision: one row per input vector with
    (vec_id, cluster, kept, max_kept_cosine). Deterministic — priority
    is ascending id, and the float comparisons are on exact BLAS
    products of the same doubles on every run."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        ids_s, kept, best = _nms_scan(ids, X, tau)
        return pd.DataFrame(
            {
                "vec_id": ids_s,
                "cluster": int(key[0]),
                "kept": kept,
                "max_kept_cosine": np.round(best, 6),
            }
        )

    return (
        assigned.select(F.col(id_col), F.col(vec_col), F.col(cluster_col))
        .groupBy(cluster_col)
        .applyInPandas(fn, FLAGS_SCHEMA)
    )
