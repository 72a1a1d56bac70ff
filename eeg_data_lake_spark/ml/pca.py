"""Distributed PCA over an embedding column — the dimensionality
reduction every embedding pipeline runs before clustering/indexing
(IVF cell training on PCA'd vectors, whitening before cosine, storage
compression ahead of PQ).

Scale design mirrors ml/ridge.py's sufficient-statistics pattern: the
covariance inputs (n, Σx, ΣxxT) accumulate per partition inside
``mapInPandas`` (Arrow batches, one vectorized X.T@X per batch), ONE
row per partition reaches the driver, and the d×d eigendecomposition
(numpy ``eigh`` — symmetric, deterministic) runs there in O(d³) for a
d that is 64–4096 in practice. The data never concentrates anywhere.

Sign convention: eigenvectors are flipped so the largest-|entry|
coordinate is positive — eigh's sign is arbitrary, and pinning it
makes projections reproducible across runs/partitionings (the same
determinism discipline as the md5-gated samplers).

Projection happens JVM-side: components become literal arrays and
each score is a zip_with/aggregate dot product inside whole-stage
codegen — no Python worker in the projection path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(df: DataFrame, vec_col: str, dim: int | None, k: int):
    """Fit PCA from distributed sufficient statistics.

    Returns (components, eigenvalues, mean): components is (k, dim)
    rows = top-k eigenvectors of the sample covariance (sign-pinned),
    eigenvalues the matching variances (descending), mean the column
    mean vector. ``dim`` may be None — each partition infers it from
    its first batch and the driver cross-checks that the partials
    agree, so callers need no eager ``.first()`` probe at plan-build
    time; ``k`` is clamped to the discovered dim."""

    def partials(batches):
        n = 0
        s = ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if s is None:
                d = x.shape[1]
                s = np.zeros(d)
                ss = np.zeros((d, d))
            elif x.shape[1] != d:
                # must raise HERE: a (1,)-wide later batch would numpy-
                # broadcast into the (d,)/(d,d) accumulators silently
                raise ValueError(
                    f"pca_fit: inconsistent vector dims within a "
                    f"partition ({x.shape[1]} vs {d})"
                )
            n += len(x)
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = (
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(partials, schema=f"n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    dims = {len(r["s"]) for r in rows}
    if len(dims) != 1 or (dim is not None and dims != {dim}):
        raise ValueError(f"pca_fit: inconsistent vector dims {sorted(dims)}")
    dim = dims.pop()
    k = min(k, dim)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, dim)
    vals = vals[order]
    # sign pin: largest-|entry| coordinate positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals, mean


def pca_project(
    df: DataFrame, vec_col: str, comps: np.ndarray, mean: np.ndarray
) -> DataFrame:
    """``df`` + ``pc0..pc{k-1}`` score columns, computed as JVM-side
    centered dot products against literal component arrays."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x - m,
    )
    out = df.withColumn("__c", centered)
    for i, comp in enumerate(comps):
        c = F.array(*[F.lit(float(v)) for v in comp])
        score = F.aggregate(
            F.zip_with(F.col("__c"), c, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out.withColumn(f"pc{i}", score)
    return out.drop("__c")
