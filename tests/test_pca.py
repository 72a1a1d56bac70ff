"""Distributed PCA vs numpy on the same data: eigenvalues, components
(up to the pinned sign — which must equal numpy's after the same pin),
projections, and the variance-explained contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.ml.pca import pca_fit, pca_project
from eeg_data_lake_spark.workload.registry import t

DIM, K = 8, 3


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(11)
    # anisotropic cloud: three dominant directions by construction
    base = rng.normal(size=(400, DIM)) * np.array([5, 3, 2, 1, 1, 1, 1, 1])
    rot, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    x = base @ rot + rng.normal(size=DIM)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    return x, df


def test_fit_matches_numpy(data):
    x, df = data
    comps, vals, mean = pca_fit(df, "embedding", DIM, K)
    nc, nv, nm = _numpy_pca(x, K)
    assert np.allclose(mean, nm, atol=1e-9)
    assert np.allclose(vals, nv, rtol=1e-9)
    assert np.allclose(comps, nc, atol=1e-8)


def test_projection_matches_numpy_and_stays_jvm(data, spark):
    x, df = data
    comps, _vals, mean = pca_fit(df, "embedding", DIM, K)
    out = pca_project(df, "embedding", comps, mean).orderBy("vec_id")
    got = np.array(
        [[r[f"pc{i}"] for i in range(K)] for r in out.collect()]
    )
    want = (x - x.mean(axis=0)) @ comps.T
    assert np.allclose(got, want, atol=1e-8)
    # projection plan has no Python stage (ArrowEvalPython/BatchEvalPython)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_variance_explained_ordering(data):
    x, df = data
    _comps, vals, _mean = pca_fit(df, "embedding", DIM, DIM)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(DIM - 1))
    total = np.trace(np.cov(x, rowvar=False, ddof=1))
    assert np.isclose(vals.sum(), total, rtol=1e-9)


def test_partitioning_invariance(data):
    """Sufficient statistics are associative: 1 vs 13 partitions give
    identical results (floating sums commute within tolerance)."""
    _x, df = data
    c1, v1, m1 = pca_fit(df.coalesce(1), "embedding", DIM, K)
    c13, v13, m13 = pca_fit(df.repartition(13), "embedding", DIM, K)
    assert np.allclose(v1, v13, rtol=1e-9)
    assert np.allclose(c1, c13, atol=1e-8)


def test_mixed_dims_within_one_partition_raise(spark):
    """A later Arrow batch of narrower vectors must raise, not numpy-
    broadcast into the accumulators (which would silently corrupt the
    components while passing the cross-partition dim check)."""
    import pytest

    from eeg_data_lake_spark.ml.pca import pca_fit

    rows = [([1.0, 2.0, 3.0],)] * 4 + [([9.0],)] * 2
    df = spark.createDataFrame(rows, "v array<double>").coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        with pytest.raises(Exception, match="inconsistent vector dims"):
            pca_fit(df, "v", dim=None, k=2)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
