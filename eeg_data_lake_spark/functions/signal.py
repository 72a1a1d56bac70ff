"""Signal-processing UDF layer (SURVEY.md §2.9 U1/U2).

The reference band-pass filters EEG outside Spark: an order-4
Butterworth 1–40 Hz design + zero-phase ``filtfilt``, applied one CSV
at a time in a sequential pandas loop
(/root/reference/bronze-to-silver.py:19-34, :71-91 — the scalability
cliff). Here the same computation runs *inside* Spark as a grouped-map
pandas UDF: ``applyInPandas`` over (trial, channel) groups, so the
filter parallelizes across every group in the cluster and the data
never leaves executor memory.

scipy is not available in this container, so the filter kernel is a
self-contained numpy implementation of the textbook pipeline:

    analog Butterworth prototype → lp→bp transform → bilinear z-map
    → direct-form-II-transposed lfilter → odd-extension filtfilt

(the same construction scipy.signal documents for butter/filtfilt).
An IIR forward-backward filter needs the full ordered series per
group, which is exactly what a grouped-map UDF provides — this is not
expressible with built-in SQL functions.

Scale notes (100 TB): the shuffle key is the group key
(trial_id, channel); groups are independent and bounded (one trial's
samples fit comfortably in one Arrow batch), so the operator scales
linearly with executor count. Skewed group sizes are impossible by
construction (trials have ~fixed length).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# filter design
# ---------------------------------------------------------------------------

def _butter_analog_poles(order: int) -> np.ndarray:
    """Poles of the analog Butterworth low-pass prototype (unit cutoff):
    equally spaced on the left half of the unit circle."""
    k = np.arange(order)
    return np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))


def butter_bandpass(
    lowcut: float, highcut: float, fs: float, order: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Design an order-``order`` Butterworth band-pass and return digital
    transfer-function coefficients ``(b, a)``.

    Matches the reference's design call
    ``butter(4, [1, 40], btype="band", fs=128)``
    (/root/reference/bronze-to-silver.py:19-21) in construction: analog
    prototype, low-pass→band-pass spectral transform, bilinear transform
    with frequency prewarping.
    """
    if not 0 < lowcut < highcut < fs / 2:
        raise ValueError("require 0 < lowcut < highcut < fs/2")
    fs2 = 2.0 * fs
    # prewarp the band edges so the bilinear map lands them exactly
    w1 = fs2 * np.tan(np.pi * lowcut / fs)
    w2 = fs2 * np.tan(np.pi * highcut / fs)
    bw, w0 = w2 - w1, np.sqrt(w1 * w2)

    # analog prototype (no zeros, unit gain)
    p_lp = _butter_analog_poles(order)

    # lp→bp: each prototype pole splits into a conjugate pair; n zeros at s=0
    pb = p_lp * bw / 2.0
    disc = np.sqrt(pb**2 - w0**2)
    p_bp = np.concatenate([pb + disc, pb - disc])
    z_bp = np.zeros(order)
    k_bp = bw**order

    # bilinear s→z with gain bookkeeping; band-pass degree gap puts
    # `order` extra zeros at z = -1
    z_d = (fs2 + z_bp) / (fs2 - z_bp)
    p_d = (fs2 + p_bp) / (fs2 - p_bp)
    k_d = k_bp * np.real(np.prod(fs2 - z_bp) / np.prod(fs2 - p_bp))
    z_d = np.concatenate([z_d, -np.ones(order)])

    b = np.real(k_d * np.poly(z_d))
    a = np.real(np.poly(p_d))
    return b, a


# ---------------------------------------------------------------------------
# filtering kernels
# ---------------------------------------------------------------------------

def lfilter(
    b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Direct-form-II-transposed IIR filter. Returns (y, zf).

    The per-sample loop is over ``len(x)`` with O(order) vector state —
    fine for trial-sized groups (~10³ samples); the parallelism comes
    from running thousands of groups at once, not from this kernel.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b, a = b / a[0], a / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    z = np.zeros(n - 1) if zi is None else np.array(zi, dtype=np.float64)
    y = np.empty_like(x, dtype=np.float64)
    for m in range(len(x)):
        xm = x[m]
        ym = b[0] * xm + z[0]
        z[:-1] = z[1:] + b[1:-1] * xm - a[1:-1] * ym
        z[-1] = b[-1] * xm - a[-1] * ym
        y[m] = ym
    return y, z


def _lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a unit step input (so filtfilt
    startup transients vanish for the extended signal's first value)."""
    b, a = np.asarray(b, float), np.asarray(a, float)
    b, a = b / a[0], a / a[0]
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    # companion matrix of a
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:]
    comp[1:, :-1] = np.eye(n - 2)
    rhs = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - comp.T, rhs)


def _odd_ext(x: np.ndarray, padlen: int) -> np.ndarray:
    """Odd (anti-symmetric) extension at both ends — the scipy.signal
    padding convention both filtfilt variants share; one definition so
    the easy-to-misslice index arithmetic cannot drift between them."""
    return np.concatenate(
        [2 * x[0] - x[padlen:0:-1], x, 2 * x[-1] - x[-2 : -padlen - 2 : -1]]
    )


def filtfilt(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering with odd-reflection padding
    (the reference relies on this to avoid phase-shifting EEG features:
    /root/reference/bronze-to-silver.py:33-34)."""
    x = np.asarray(x, dtype=np.float64)
    ntaps = max(len(a), len(b))
    padlen = 3 * (ntaps - 1)
    if len(x) <= padlen:
        raise ValueError(
            f"input length {len(x)} must exceed padlen {padlen}"
        )
    ext = _odd_ext(x, padlen)
    zi = _lfilter_zi(b, a)
    y, _ = lfilter(b, a, ext, zi * ext[0])
    y = y[::-1]
    y, _ = lfilter(b, a, y, zi * y[0])
    y = y[::-1]
    return y[padlen : len(y) - padlen]


def filtfilt_fft(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase filtering via the frequency domain: apply |H(ω)|² —
    exactly the magnitude response of forward-backward IIR filtering —
    to the odd-extended signal with one rfft/irfft pair.

    This is the vectorized kernel ``bandpass_by_group`` uses by
    default: numerically it matches the sequential ``filtfilt`` away
    from the ends (equivalence asserted in tests), but runs as two
    FFTs instead of a per-sample Python loop — the difference between
    2.6 s and 0.1 s over 100 k samples, and the right shape for Arrow
    batches. Edge behavior differs slightly (circular vs transient),
    which is why the extension pad here is longer (IIR tail length).
    """
    x = np.asarray(x, dtype=np.float64)
    ntaps = max(len(a), len(b))
    padlen = min(len(x) - 1, max(3 * (ntaps - 1), 256))
    if padlen < 1:
        return x.copy()
    ext = _odd_ext(x, padlen)
    n = len(ext)
    w = np.exp(-2j * np.pi * np.arange(n // 2 + 1) / n)
    h = np.polyval(b[::-1], w) / np.polyval(a[::-1], w)
    y = np.fft.irfft(np.fft.rfft(ext) * np.abs(h) ** 2, n=n)
    return y[padlen : padlen + len(x)]


# ---------------------------------------------------------------------------
# Spark grouped-map operators
# ---------------------------------------------------------------------------

def _pinned_groups(df: DataFrame, group_cols):
    """groupBy for a Python-CPU-heavy grouped-map stage, with partition
    count pinned to the default parallelism.

    AQE coalesces shuffle partitions by BYTE size, which is blind to
    per-row Python cost: a few MB of groups can carry seconds of UDF
    work, and coalescing them onto one partition serializes every
    group through a single Python worker (measured 4.7 s → 1.7 s on
    100 k rows / 1500 groups). An explicit repartition-by-number on
    the group key is exempt from AQE coalescing, and the following
    groupBy reuses its hash partitioning, so this adds no extra
    exchange — it just holds parallelism for the UDF stage.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *group_cols).groupBy(*group_cols)


def bandpass_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str | Sequence[str],
    value_col: str,
    lowcut: float,
    highcut: float,
    fs: float,
    order: int = 4,
    out_col: str = "value_filt",
    method: str = "fft",
) -> DataFrame:
    """Band-pass ``value_col`` within each group, ordered by ``order_col``
    (U1 brought inside Spark). Adds ``out_col`` (double); groups shorter
    than the filtfilt pad length pass through unfiltered (NaN-free).
    ``method``: "fft" (vectorized zero-phase, default) or "exact"
    (sequential direct-form filtfilt, reference semantics).
    """
    b, a = butter_bandpass(lowcut, highcut, fs, order)
    padlen = 3 * (max(len(a), len(b)) - 1)
    sort_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    kernel = {"fft": filtfilt_fft, "exact": filtfilt}[method]
    schema = T.StructType(
        list(df.schema) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        pdf[out_col] = kernel(b, a, x) if len(x) > padlen else x
        return pdf

    return _pinned_groups(df, group_cols).applyInPandas(fn, schema)


def standardize_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "value_std",
) -> DataFrame:
    """Per-group (x - mean) / std with population std and a std=0 guard —
    the pandas-path standardization (U2,
    /root/reference/bronze-to-silver.py:36-38) as a grouped-map UDF.
    Kept alongside the native window z-score (W1) so tests can assert
    the two paths agree; production uses W1 (JVM-side, no Python hop).
    """
    schema = T.StructType(
        list(df.schema) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        # NaN-skipping moments (SQL aggregate semantics, matching the
        # W1 window twin): one NaN sample must not make std NaN and
        # silently zero the WHOLE group — valid samples standardize
        # against the valid moments, NaN samples stay NaN
        valid = ~np.isnan(x)
        if valid.any():
            xv = x[valid]
            std = xv.std()  # population std, matching StandardScaler
            mean = xv.mean()
        else:
            std, mean = 0.0, 0.0
        z = (x - mean) / std if std > 0 else np.zeros_like(x)
        pdf[out_col] = np.where(valid, z, np.nan)
        return pdf

    return _pinned_groups(df, group_cols).applyInPandas(fn, schema)
