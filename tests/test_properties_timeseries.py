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
    s = np.round(np.cumsum(xs - xs.mean()), 6)
    rng = round(s.max() - s.min(), 6)
    cp = int(np.lexsort((np.arange(len(s)), -np.abs(s)))[0]) + 1
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
            exp_rng, exp_cp = _np_cusum(xs)
            assert rows[u].cusum_range == pytest.approx(exp_rng, abs=2e-6)
            assert rows[u].cp_index == exp_cp
            # deviations-from-mean are shift-invariant
            assert shifted[u].cusum_range == pytest.approx(
                rows[u].cusum_range, abs=2e-6
            )
            assert shifted[u].cp_index == rows[u].cp_index

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
