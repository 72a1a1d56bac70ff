"""Property-style checks for the CUSUM (r67) and Holt (r68) plans:
the distributed window/fold implementations must equal plain NumPy
recursions on randomized series, plus the algebraic invariances the
statistics promise (CUSUM shift-invariance, Holt homogeneity). Each
example writes a tiny synthetic events table and runs the REGISTERED
query on it — the exact code path the driver checks."""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eeg_data_lake_spark.workload import REGISTRY
from eeg_data_lake_spark.workload.analytics import (
    EWMA_ALPHA,  # noqa: F401  (module import sanity)
    HOLT_ALPHA,
    HOLT_BETA,
    HOLT_H,
)


def _events_dir(values_by_user: dict[int, np.ndarray]) -> str:
    rows = []
    eid = 0
    for uid, xs in values_by_user.items():
        for i, x in enumerate(xs):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "user_id": uid,
                    "event_type": "view",
                    "value": float(x),
                    "props": "{}",
                }
            )
            eid += 1
    d = tempfile.mkdtemp(prefix="ts_prop_")
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)), f"{d}/events.parquet"
    )
    return d


def _np_cusum(xs: np.ndarray) -> tuple[float, int]:
    """Replicates r67's EXACT integer model: values quantized to
    micro-units with HALF_UP (Spark round), denominator-free centered
    prefix sums ss_k = n*cs_k - k*S_n on int64, one final division."""
    x = np.asarray(xs, dtype=np.float64) * 1e6
    v = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
    n = len(v)
    cs = np.cumsum(v)
    ss = n * cs - np.arange(1, n + 1, dtype=np.int64) * cs[-1]
    rng = round(float(ss.max() - ss.min()) / (n * 1e6), 6)
    cp = int(np.lexsort((np.arange(n), -np.abs(ss)))[0]) + 1
    return rng, cp


def _np_holt(xs: np.ndarray) -> tuple[float, float]:
    l, b = float(xs[0]), 0.0
    for x in xs[1:]:
        ln = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (ln - l) + (1 - HOLT_BETA) * b
        l = ln
    return l, b


@pytest.mark.usefixtures("spark")
class TestTimeseriesProperties:
    @given(seed=st.integers(0, 2**16), shift=st.floats(-100, 100, allow_nan=False))
    @settings(max_examples=5, deadline=None)
    def test_cusum_matches_numpy_and_is_shift_invariant(self, spark, seed, shift):
        rng = np.random.default_rng(seed)
        data = {u: rng.standard_normal(rng.integers(2, 40)) * 10 for u in range(3)}
        rows = {
            r.user_id: r
            for r in REGISTRY["r67_cusum_changepoint"]
            .spark_fn(spark, _events_dir(data))
            .collect()
        }
        shifted = {
            r.user_id: r
            for r in REGISTRY["r67_cusum_changepoint"]
            .spark_fn(spark, _events_dir({u: xs + shift for u, xs in data.items()}))
            .collect()
        }
        for u, xs in data.items():
            # each run matches the exact integer model bit-for-bit
            # (1e-6 slack covers only the final decimal rounding mode:
            # Spark HALF_UP vs Python round-half-even on one double)
            exp_rng, exp_cp = _np_cusum(xs)
            assert rows[u].cusum_range == pytest.approx(exp_rng, abs=1.1e-6)
            assert rows[u].cp_index == exp_cp
            sh_rng, sh_cp = _np_cusum(xs + shift)
            assert shifted[u].cusum_range == pytest.approx(sh_rng, abs=1.1e-6)
            assert shifted[u].cp_index == sh_cp
            # deviations-from-mean are shift-invariant up to the
            # micro-quantization of the SHIFTED values: each ss_k
            # moves by at most n*k + k*n <= 2n^2 integer units, so the
            # range moves by <= 4n^2/(n*1e6) = 4n/1e6
            assert shifted[u].cusum_range == pytest.approx(
                rows[u].cusum_range, abs=4 * len(xs) / 1e6 + 2.2e-6
            )

    @given(seed=st.integers(0, 2**16), c=st.floats(0.1, 10, allow_nan=False))
    @settings(max_examples=5, deadline=None)
    def test_holt_matches_numpy_and_is_homogeneous(self, spark, seed, c):
        rng = np.random.default_rng(seed)
        data = {u: rng.standard_normal(rng.integers(1, 40)) * 5 for u in range(3)}
        rows = {
            r.user_id: r
            for r in REGISTRY["r68_holt_forecast"]
            .spark_fn(spark, _events_dir(data))
            .collect()
        }
        scaled = {
            r.user_id: r
            for r in REGISTRY["r68_holt_forecast"]
            .spark_fn(spark, _events_dir({u: xs * c for u, xs in data.items()}))
            .collect()
        }
        for u, xs in data.items():
            l, b = _np_holt(xs)
            assert rows[u].level == pytest.approx(round(l, 6), abs=2e-6)
            assert rows[u].trend == pytest.approx(round(b, 6), abs=2e-6)
            assert rows[u].forecast_3 == pytest.approx(
                round(l + HOLT_H * b, 6), abs=2e-6
            )
            # the recursion is linear-homogeneous: scaling x scales state
            assert scaled[u].level == pytest.approx(
                c * rows[u].level, abs=1e-4 * max(1.0, abs(c * rows[u].level))
            )
