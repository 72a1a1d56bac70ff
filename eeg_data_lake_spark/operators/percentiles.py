"""Distributed exact percentiles via cumulative rank arithmetic.

Spark's exact ``percentile`` aggregate keeps a value→count map as
per-partition state and merges those maps into one reducer per group —
with few groups the merge is a serial bottleneck and the partial state
is as large as the distinct values (the reference's gold layer dodges
this with percentile_approx, main/gold.py:67-68, at the cost of
sketch-dependent results). This operator computes the *same* linearly
interpolated quantiles as ``percentile`` / ``quantile_cont`` with a
fully parallel plan:

1. ``groupBy(key, value).count()``      — the only heavy shuffle; map-side
   combine collapses duplicates, parallelism = shuffle partitions.
2. cumulative-count window per key      — runs on |distinct values| rows
   (not |rows|), one partition per key.
3. pick the two bracketing values per   — conditional aggregation, tiny.
   target rank and interpolate

At 100 TB the step-2 window sees only per-key distinct values; if even
that is too large, pre-bucketing values (floor(v/w)*w) bounds it with a
controllable error — the step-1 shuffle shape is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    key: str,
    value: str,
    ps: Sequence[float],
    prefix: str = "p",
) -> DataFrame:
    """One row per ``key`` with a ``{prefix}{int(p*100)}`` column per
    requested percentile, matching ``percentile(value, p)`` bit-for-bit
    (same k = (n-1)·p linear interpolation on the same doubles)."""
    pc = df.groupBy(key, value).agg(F.count(F.lit(1)).alias("_c"))
    wk = Window.partitionBy(key)
    w = wk.orderBy(value)
    cum = (
        pc.withColumn("_hi", F.sum("_c").over(w))
        .withColumn("_lo", F.col("_hi") - F.col("_c"))
        .withColumn("_n", F.sum("_c").over(wk))
    )
    aggs = []
    for p in ps:
        k = (F.col("_n") - 1) * F.lit(float(p))
        kf = F.floor(k)
        # value occupying 0-based rank kf / kf+1 (rank r lives in the
        # unique row with _lo <= r < _hi)
        v_lo = F.max(
            F.when((F.col("_lo") <= kf) & (kf < F.col("_hi")), F.col(value))
        )
        v_hi = F.max(
            F.when((F.col("_lo") <= kf + 1) & (kf + 1 < F.col("_hi")), F.col(value))
        )
        frac = F.max(k - kf)
        name = f"{prefix}{int(round(p * 100))}"
        aggs.append(
            (v_lo + frac * (F.coalesce(v_hi, v_lo) - v_lo)).alias(name)
        )
    return cum.groupBy(key).agg(*aggs)
