"""t-digest: quantile accuracy vs exact, mergeability, determinism,
centroid-count bound, edge cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.tdigest import (
    _compress,
    _digest_row,
    build_digests,
    merge_digests,
    tdigest_quantile,
)
from eeg_data_lake_spark.workload import REGISTRY
from eeg_data_lake_spark.workload.registry import t


def _est(values: np.ndarray, q: float, delta: float = 100.0) -> float:
    cents, lo, hi, _ = _digest_row(values, delta)
    return tdigest_quantile(cents, lo, hi, q)


def test_local_accuracy_on_known_distributions():
    rng = np.random.default_rng(7)
    for vals in (
        rng.normal(50, 10, 20_000),
        rng.exponential(3.0, 20_000),
        np.arange(10_000, dtype=float),
    ):
        for q in (0.01, 0.25, 0.5, 0.75, 0.95, 0.99):
            exact = float(np.quantile(vals, q))
            est = _est(vals, q)
            spread = float(np.quantile(vals, 0.99) - np.quantile(vals, 0.01))
            assert abs(est - exact) <= 0.02 * spread, (q, est, exact)


def test_centroid_count_bounded_and_exact_total():
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 50_000)
    cents, lo, hi, n = _digest_row(vals, delta=100.0)
    assert n == 50_000
    assert sum(w for _, w in cents) == 50_000  # lossless weight
    assert len(cents) <= 200  # ~δ centroids regardless of input size
    assert lo == float(vals.min()) and hi == float(vals.max())


def test_merge_equals_rebuild_within_tolerance():
    """digest(A ∪ B) and merge(digest(A), digest(B)) must answer
    quantiles nearly identically — the mergeability contract."""
    rng = np.random.default_rng(11)
    a, b = rng.normal(0, 1, 8_000), rng.normal(5, 2, 12_000)
    ca, la, ha, _ = _digest_row(a, 100.0)
    cb, lb, hb, _ = _digest_row(b, 100.0)
    m = np.array([c[0] for c in ca + cb])
    w = np.array([float(c[1]) for c in ca + cb])
    mm, mw = _compress(m, w, 100.0)
    merged = list(zip(mm.tolist(), mw.tolist()))
    both = np.concatenate([a, b])
    for q in (0.1, 0.5, 0.9, 0.99):
        direct = _est(both, q)
        via_merge = tdigest_quantile(merged, min(la, lb), max(ha, hb), q)
        spread = float(np.quantile(both, 0.99) - np.quantile(both, 0.01))
        assert abs(direct - via_merge) <= 0.02 * spread


def test_rollup_query_accuracy_vs_exact(spark, sf_dir):
    """Gate on RANK error — the quantity t-digests actually bound.
    Value-error gates are meaningless for small groups where p99 falls
    between widely-spaced order statistics."""
    got = {
        r.event_type: r
        for r in REGISTRY["z11_tdigest_rollup"].spark_fn(spark, sf_dir).collect()
    }
    vals: dict[str, list[float]] = {}
    for r in t(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(got) == set(vals)
    for et, g in got.items():
        v = np.sort(np.array(vals[et], dtype=np.float64))
        n = len(v)
        assert g.d_count == n
        for p, q in (("p50", 0.50), ("p95", 0.95), ("p99", 0.99)):
            est = getattr(g, p)
            rank = float(np.searchsorted(v, est, side="left")) / n
            assert abs(rank - q) <= max(0.02, 3.0 / n), (et, p, rank)


def test_rollup_deterministic(spark, sf_dir):
    a = sorted(
        map(tuple, REGISTRY["z11_tdigest_rollup"].spark_fn(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, REGISTRY["z11_tdigest_rollup"].spark_fn(spark, sf_dir).collect())
    )
    assert a == b


def test_empty_and_single_value_groups(spark):
    df = spark.createDataFrame(
        [("a", 42.0), ("b", float("nan"))], "g string, v double"
    )
    d = build_digests(df, ["g"], "v")
    rows = {r.g: r for r in d.collect()}
    assert rows["a"].centroids[0].asDict() == {"mean": 42.0, "weight": 1}
    assert rows["a"].d_count == 1
    assert rows["b"].d_count == 0 and rows["b"].centroids == []
    merged = merge_digests(d, ["g"]).collect()
    assert {r.g: r.d_count for r in merged} == {"a": 1, "b": 0}
