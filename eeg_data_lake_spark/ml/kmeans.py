"""Distributed Lloyd's k-means over an embedding column.

The reference's ML surface is scikit-style single-node (SURVEY §2.9
U5/U6); clustering is the missing piece a training-data pipeline needs
at scale — as the learned coarse quantizer for IVF ANN (q99 uses seeded
spherical centroids; this trains real ones) and for corpus
stratification / diversity sampling.

Spark-first design, the standard scalable Lloyd's decomposition:

- **Assignment** is embarrassingly parallel: centroids (k×d floats)
  ship to executors inside the UDF closure — a broadcast of kilobytes
  — and a scalar *pandas* UDF computes ``argmin_c ||x - c||²`` for an
  Arrow batch at a time with one BLAS matmul (``X @ C.T``), never a
  Python-per-row loop.
- **Update** is a map-side-combinable aggregation: ``posexplode`` the
  vector and average per ``(cluster, dim)`` — the shuffle carries
  k·d·n_partitions partial sums, independent of corpus size. Only the
  k×d centroid matrix is ever collected to the driver.
- **Convergence** is driver-side: stop when the max centroid movement
  drops under ``tol`` or after ``max_iter`` rounds. Inertia (sum of
  squared distances) is computed from the same assignment pass and is
  non-increasing across iterations — pinned in tests.

Empty clusters keep their previous centroid (a standard choice that
keeps k stable); initialization is deterministic — the k vectors with
the smallest ids — so runs are reproducible and oracle-comparable
against a numpy reference implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)


@dataclass
class KMeansModel:
    centroids: np.ndarray  # (k, d) float64
    n_iter: int
    inertia: float  # at the final assignment
    history: list[float] = field(default_factory=list)  # inertia per iter


_ASSIGN_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType()),
        StructField("sqdist", DoubleType()),
    ]
)


def _assign_udf(centroids: np.ndarray):
    """Scalar pandas UDF: embedding → (nearest cluster, squared dist).

    ``C`` rides in the closure (k×d — kilobytes); the distance matrix
    is one matmul per Arrow batch: ||x-c||² = ||x||² - 2x·c + ||c||²."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def assign(emb: pd.Series) -> pd.DataFrame:
        X = np.stack(emb.to_numpy()).astype(np.float64, copy=False)
        d2 = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ C.T) + c_sq
        lab = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": lab.astype(np.int32),
                # clamp tiny negative fp residue so inertia stays ≥ 0
                "sqdist": np.maximum(d2[np.arange(len(lab)), lab], 0.0),
            }
        )

    return assign


def assign_clusters(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """``df`` + ``cluster``/``sqdist`` columns for fixed centroids."""
    a = _assign_udf(centroids)(F.col(vec_col)).alias("a")
    return df.withColumn("a", a).select("*", "a.cluster", "a.sqdist").drop("a")


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> KMeansModel:
    """Lloyd's iterations until centroid movement < ``tol`` (L∞ over
    L2 shifts) or ``max_iter``. Deterministic init: the ``k`` rows with
    the smallest ``id_col`` (reproducible across partitionings, unlike
    a sample). The input is persisted for the iteration loop and
    unpersisted before returning. NULL/empty embeddings are dropped up
    front: one such row reaching np.stack inside the assignment UDF
    raises an opaque executor-side error naming neither row nor cause."""
    vecs = (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(id_col, F.col(vec_col).alias("__v"))
        .persist()
    )
    try:
        seed_rows = vecs.orderBy(id_col).limit(k).collect()
        if len(seed_rows) < k:
            raise ValueError(f"k={k} but only {len(seed_rows)} vectors")
        C = np.array([r["__v"] for r in seed_rows], dtype=np.float64)
        history: list[float] = []
        n_iter = 0
        inertia = float("nan")
        for n_iter in range(1, max_iter + 1):
            assigned = assign_clusters(vecs, C, "__v")
            # update: map-side-combined (cluster, dim) partial averages
            stats = (
                assigned.select(
                    "cluster",
                    "sqdist",
                    F.posexplode(
                        F.transform("__v", lambda x: x.cast("double"))
                    ).alias("dim", "x"),
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.avg("x").alias("mu"),
                    # per-cluster inertia partials; dim 0 carries them
                    F.sum(F.when(F.col("dim") == 0, F.col("sqdist"))).alias(
                        "sq"
                    ),
                )
                .collect()
            )
            newC = C.copy()  # empty cluster -> keep previous centroid
            inertia = 0.0
            for r in stats:
                newC[r.cluster, r.dim] = r.mu
                if r.dim == 0 and r.sq is not None:
                    inertia += r.sq
            history.append(inertia)
            shift = float(np.sqrt(((newC - C) ** 2).sum(axis=1)).max())
            C = newC
            if shift < tol:
                break
        return KMeansModel(C, n_iter, inertia, history)
    finally:
        vecs.unpersist()
