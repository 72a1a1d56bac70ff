"""Spectral features: periodogram PSD and EEG band power.

The reference's gold layer computes time-domain trial features
(amplitude stats, Hjorth — /root/reference/main/gold.py); the standard
next step every EEG pipeline takes is frequency-domain band power
(delta/theta/alpha/beta/gamma), which the reference leaves to its
notebook consumers. Implemented here as real numpy spectral math on
the same grouped-map pandas-UDF path as the Butterworth filter (U1):
one Arrow batch per group, shuffle keyed on the group, partition count
pinned against AQE byte-based coalescing (signal.py:_pinned_groups).

Kernel conventions (pinned by Parseval tests):

- ``periodogram``: one-sided PSD via rfft with a rectangular window,
  density scaling — ``sum(psd) * (fs/n) == mean(x²)`` exactly
  (Parseval), the property the tests assert. A Hann window is
  available for leakage-sensitive use; it trades the exact identity
  for side-lobe suppression, same as scipy.signal.periodogram.
- ``band_power``: PSD integrated over [lo, hi) bins per band;
  relative powers divide by total power across all defined bands.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from eeg_data_lake_spark.functions.signal import _pinned_groups

#: canonical EEG bands (Hz); gamma capped below the fs/2=64 Nyquist
EEG_BANDS: dict[str, tuple[float, float]] = {
    "delta": (0.5, 4.0),
    "theta": (4.0, 8.0),
    "alpha": (8.0, 13.0),
    "beta": (13.0, 30.0),
    "gamma": (30.0, 45.0),
}


def periodogram(
    x: np.ndarray, fs: float, window: str = "rect"
) -> tuple[np.ndarray, np.ndarray]:
    """One-sided (freqs, psd) with density scaling. Rectangular window
    keeps Parseval exact: ``psd.sum() * fs / n == mean(x**2)``."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if window == "hann":
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
        x = x * w
        norm = fs * (w * w).sum()
    elif window == "rect":
        norm = fs * n
    else:
        raise ValueError(f"unknown window {window!r}")
    spec = np.fft.rfft(x)
    psd = (spec.real**2 + spec.imag**2) / norm
    # one-sided: double everything except DC (and Nyquist when n even)
    if n % 2 == 0:
        psd[1:-1] *= 2.0
    else:
        psd[1:] *= 2.0
    return np.fft.rfftfreq(n, 1.0 / fs), psd


def band_power(
    x: np.ndarray,
    fs: float,
    bands: dict[str, tuple[float, float]] = EEG_BANDS,
    window: str = "rect",
) -> dict[str, float]:
    """Absolute power per band: PSD integrated (rectangle rule,
    df = fs/n) over lo <= f < hi."""
    freqs, psd = periodogram(x, fs, window)
    df_hz = fs / len(x)
    return {
        name: float(psd[(freqs >= lo) & (freqs < hi)].sum() * df_hz)
        for name, (lo, hi) in bands.items()
    }


def band_power_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    fs: float,
    bands: dict[str, tuple[float, float]] = EEG_BANDS,
) -> DataFrame:
    """One row per group: n_samples, absolute power per band, relative
    power per band (share of the summed band powers; 0.0 when the
    signal is flat). Grouped-map pandas UDF on the pinned-partition
    plan — linear scale-out over groups, no skew hazard for bounded
    series."""
    sort_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    names = list(bands)
    fields = [df.schema[c] for c in group_cols]
    fields.append(T.StructField("n_samples", T.IntegerType()))
    for n in names:
        fields.append(T.StructField(f"{n}_power", T.DoubleType()))
        fields.append(T.StructField(f"{n}_rel", T.DoubleType()))
    schema = T.StructType(fields)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        # nulls/NaNs would propagate through the FFT into NaN powers
        # while `total > 0` still zeroes the relatives — an
        # inconsistent half-NaN row. Treat non-finite samples as
        # absent (the same contract as SQL aggregates skipping NULLs).
        x = x[np.isfinite(x)]
        if len(x):
            powers = band_power(x, fs, bands)
        else:  # all-null group: zero power everywhere, consistently
            powers = {n: 0.0 for n in names}
        total = sum(powers.values())
        row = [pdf[c].iloc[0] for c in group_cols] + [len(x)]
        for n in names:
            row.append(powers[n])
            row.append(powers[n] / total if total > 0 else 0.0)
        return pd.DataFrame([row], columns=[f.name for f in schema.fields])

    return _pinned_groups(df, group_cols).applyInPandas(fn, schema)
