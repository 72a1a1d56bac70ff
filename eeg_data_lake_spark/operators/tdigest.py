"""Mergeable t-digest quantile sketches (Dunning & Ertl, "Computing
extremely accurate quantiles using t-digests") — the quantile
companion to the HLL rollup (z01) and count-min sketch (z05): build
one digest per (group, day) partial, persist it as a COLUMN, and
answer any later quantile query over any slice of partials in
O(sketches) without re-touching raw data. That is the hypertable
rollup pattern: exact percentiles need every raw value at query time;
digests make yesterday's data a few hundred centroids forever.

This is the MergingDigest formulation: sorted input is swept once,
greedily packing values into centroids whose weight is capped by the
k1 scale function — caps shrink toward the tails (q→0, q→1), which is
what gives t-digests their ~constant *relative* quantile error where
a fixed-width histogram loses the tails. Merging digests = re-running
the same sweep over the union of centroids sorted by mean, so build
and merge share one kernel (`_compress`).

Determinism: ties in the value sort are resolved by value only (the
sweep is insensitive to the order of equal values), numpy sorts are
stable, and the k1 caps are pure float functions of cumulative
weight — the same inputs produce the identical digest on every run
and every partitioning of the MERGE level. (Partial digests are built
per PARTITION-KEY GROUP, not per Spark partition, so the build level
is partitioning-independent too.)

Representation: ``array<struct<mean double, weight long>>`` plus
(min, max) — plain columns, no opaque binary, so digests survive
parquet round-trips and are inspectable with SQL.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: digest columns appended per group
DIGEST_FIELDS = (
    "centroids array<struct<mean: double, weight: long>>, "
    "d_min double, d_max double, d_count long"
)


def _k1(q: float, delta: float) -> float:
    """The t-digest k1 scale function: k(q) = δ/(2π)·asin(2q−1)."""
    return delta / (2.0 * math.pi) * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """One merging sweep: inputs sorted by mean, outputs the centroid
    list with k1-bounded cluster weights. Shared by build (weights all
    1) and merge (weights = centroid weights)."""
    # lexsort on (mean, weight): group rows reach the merge kernel in
    # arbitrary order, and a stable mean-only sort would leak that
    # order into the output whenever two centroids share a mean
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    # running state: current cluster (sum of w*mean, sum of w) and the
    # cumulative weight BEFORE the current cluster
    acc_wm, acc_w, cum = 0.0, 0.0, 0.0
    k_lo = _k1(0.0, delta)
    for m, w in zip(means, weights):
        q_hi = (cum + acc_w + w) / total
        if acc_w > 0.0 and _k1(q_hi, delta) - k_lo > 1.0:
            out_m.append(acc_wm / acc_w)
            out_w.append(acc_w)
            cum += acc_w
            k_lo = _k1(cum / total, delta)
            acc_wm, acc_w = 0.0, 0.0
        acc_wm += w * m
        acc_w += w
    if acc_w > 0.0:
        out_m.append(acc_wm / acc_w)
        out_w.append(acc_w)
    return np.asarray(out_m), np.asarray(out_w)


def _digest_row(values: np.ndarray, delta: float) -> tuple:
    v = values[~np.isnan(values)]
    if v.size == 0:
        return ([], None, None, 0)
    m, w = _compress(v.astype(np.float64), np.ones(v.size), delta)
    cents = [(float(a), int(round(b))) for a, b in zip(m, w)]
    return (cents, float(v.min()), float(v.max()), int(v.size))


def tdigest_quantile(
    centroids: list, d_min: float, d_max: float, q: float
) -> float | None:
    """Estimate the q-quantile from a digest: linear interpolation on
    the centroid midpoint-cumulative curve, clamped to [min, max]."""
    if not centroids:
        return None
    means = np.array([c[0] for c in centroids])
    weights = np.array([c[1] for c in centroids], dtype=np.float64)
    total = weights.sum()
    target = q * total
    # midpoint rule: centroid i covers cum weight (C_i + w_i/2)
    cum = np.cumsum(weights) - weights / 2.0
    if target <= cum[0]:
        # interpolate from the true min into the first centroid
        frac = target / max(cum[0], 1e-12)
        return float(d_min + (means[0] - d_min) * min(1.0, frac))
    if target >= cum[-1]:
        frac = (target - cum[-1]) / max(total - cum[-1], 1e-12)
        return float(means[-1] + (d_max - means[-1]) * min(1.0, frac))
    i = int(np.searchsorted(cum, target)) - 1
    span = cum[i + 1] - cum[i]
    frac = (target - cum[i]) / max(span, 1e-12)
    return float(means[i] + (means[i + 1] - means[i]) * frac)


def build_digests(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    delta: float = 100.0,
) -> DataFrame:
    """One digest per group: (group_cols..., centroids, d_min, d_max,
    d_count). One shuffle on the group key; each group's sweep is a
    single sorted pass in its Arrow batch."""
    schema = (
        ", ".join(f"{c} {dict(df.dtypes)[c]}" for c in group_cols)
        + ", "
        + DIGEST_FIELDS
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cents, lo, hi, n = _digest_row(
            pdf[value_col].to_numpy(dtype=np.float64), delta
        )
        return pd.DataFrame(
            [(*key, cents, lo, hi, n)],
            columns=[*group_cols, "centroids", "d_min", "d_max", "d_count"],
        )

    return df.groupBy(*group_cols).applyInPandas(fn, schema)


def merge_digests(
    digests: DataFrame,
    group_cols: list[str],
    delta: float = 100.0,
) -> DataFrame:
    """Roll partial digests up to coarser groups — the O(sketches)
    re-aggregation that replaces re-scanning raw data. Same kernel as
    build, run over the unioned centroid lists."""
    schema = (
        ", ".join(f"{c} {dict(digests.dtypes)[c]}" for c in group_cols)
        + ", "
        + DIGEST_FIELDS
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        means: list[float] = []
        weights: list[float] = []
        for row in pdf["centroids"]:
            for c in row:
                means.append(c["mean"] if isinstance(c, dict) else c[0])
                weights.append(c["weight"] if isinstance(c, dict) else c[1])
        if not means:
            return pd.DataFrame(
                [(*key, [], None, None, 0)],
                columns=[*group_cols, "centroids", "d_min", "d_max", "d_count"],
            )
        m, w = _compress(
            np.asarray(means, dtype=np.float64),
            np.asarray(weights, dtype=np.float64),
            delta,
        )
        cents = [(float(a), int(round(b))) for a, b in zip(m, w)]
        lo = float(np.nanmin(pdf["d_min"].to_numpy(dtype=np.float64)))
        hi = float(np.nanmax(pdf["d_max"].to_numpy(dtype=np.float64)))
        n = int(pdf["d_count"].sum())
        return pd.DataFrame(
            [(*key, cents, lo, hi, n)],
            columns=[*group_cols, "centroids", "d_min", "d_max", "d_count"],
        )

    return digests.groupBy(*group_cols).applyInPandas(fn, schema)


def quantiles_from_digests(
    digests: DataFrame, qs: list[float]
) -> DataFrame:
    """Append one estimate column per requested quantile (p50 → q=0.5
    named 'p50', etc.) via a scalar iterator over Arrow batches."""
    cols = {f"p{int(q * 100):02d}": q for q in qs}
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in digests.schema.fields
    )
    schema = out_fields + ", " + ", ".join(f"{n} double" for n in cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, q in cols.items():
                pdf[name] = [
                    tdigest_quantile(
                        [
                            (c["mean"], c["weight"])
                            if isinstance(c, dict)
                            else (c[0], c[1])
                            for c in cents
                        ],
                        lo,
                        hi,
                        q,
                    )
                    if cents is not None and len(cents)
                    else None
                    for cents, lo, hi in zip(
                        pdf["centroids"], pdf["d_min"], pdf["d_max"]
                    )
                ]
            yield pdf

    return digests.mapInPandas(fn, schema)
