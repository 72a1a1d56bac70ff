"""Distributed Lloyd's k-means vs a single-node numpy reference:
same deterministic init ⇒ identical assignments and centroids, with
the classic monotone-inertia guarantee pinned."""

from __future__ import annotations

import numpy as np
import pytest

from eeg_data_lake_spark.ml.kmeans import assign_clusters, kmeans_fit


def _numpy_lloyds(X, k, n_iter):
    """Reference implementation mirroring kmeans_fit's conventions:
    lowest-id init, empty clusters keep their centroid, history[i] is
    the inertia of iteration i's assignment (pre-update)."""
    C = X[:k].copy()
    history = []
    for _ in range(n_iter):
        # same expanded form as the assignment UDF so near-tie points
        # argmin identically under fp rounding
        d2 = (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)
        lab = d2.argmin(axis=1)
        history.append(float(d2[np.arange(len(X)), lab].sum()))
        for c in range(k):
            if (lab == c).any():
                C[c] = X[lab == c].mean(axis=0)
    # final labels re-assigned against the post-update centroids, the
    # same convention as assign_clusters(df, model.centroids)
    d2 = (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)
    return C, d2.argmin(axis=1), history


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )
    X = np.array([r.embedding for r in df.collect()], dtype=np.float64)
    return df, X


def test_matches_numpy_reference(vecs):
    df, X = vecs
    k, iters = 6, 4
    model = kmeans_fit(df, k=k, max_iter=iters, tol=0.0)
    C_ref, lab_ref, hist_ref = _numpy_lloyds(X, k, iters)
    assert model.n_iter == iters
    np.testing.assert_allclose(model.centroids, C_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(model.history, hist_ref, rtol=1e-9)
    got = {
        r.vec_id: r.cluster
        for r in assign_clusters(df, model.centroids).collect()
    }
    want = dict(zip((int(r.vec_id) for r in df.collect()), lab_ref))
    # same final centroids ⇒ same assignment (ties impossible on this data)
    assert got == want


def test_inertia_monotone_nonincreasing(vecs):
    df, _ = vecs
    model = kmeans_fit(df, k=8, max_iter=6, tol=0.0)
    assert len(model.history) == 6
    for a, b in zip(model.history, model.history[1:]):
        assert b <= a + 1e-9
    assert model.inertia == model.history[-1]


def test_tol_early_stop_and_empty_cluster_guard(spark, vecs):
    df, _ = vecs
    # generous tol stops before max_iter on stable data
    model = kmeans_fit(df, k=4, max_iter=50, tol=1e3)
    assert model.n_iter < 50
    # k identical points: k-1 clusters go empty, centroids must survive
    same = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    m = kmeans_fit(same, k=3, max_iter=2, tol=0.0)
    assert m.centroids.shape == (3, 2)
    assert np.isfinite(m.centroids).all()
    with pytest.raises(ValueError, match="only"):
        kmeans_fit(same, k=9)


def test_null_and_empty_embeddings_ignored(spark):
    """A NULL or empty embedding must be dropped at entry, not raise an
    opaque np.stack error inside the assignment UDF."""
    rows = [(i, [float(i % 2), float(i // 2)]) for i in range(8)]
    rows += [(100, None), (101, [])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = kmeans_fit(df, k=2, max_iter=3)
    assert model.centroids.shape == (2, 2)
    assert np.all(np.isfinite(model.centroids))
