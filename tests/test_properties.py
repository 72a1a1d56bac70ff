"""Property-style tests: operators checked against naive reference
implementations / algebraic invariants on randomized inputs
(SURVEY.md §5's strategy — analytic properties, not golden files)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from eeg_data_lake_spark.functions.signal import (
    butter_bandpass,
    filtfilt,
    filtfilt_fft,
)

B, A = butter_bandpass(1.0, 40.0, 128.0, order=4)


class TestKernelAlgebra:
    @given(
        a=st.floats(-5, 5, allow_nan=False),
        b=st.floats(-5, 5, allow_nan=False),
        seed=st.integers(0, 2**16),
    )
    @settings(max_examples=25, deadline=None)
    def test_filtfilt_is_linear(self, a, b, seed):
        rng = np.random.default_rng(seed)
        x, y = rng.standard_normal((2, 400))
        lhs = filtfilt(B, A, a * x + b * y)
        rhs = a * filtfilt(B, A, x) + b * filtfilt(B, A, y)
        assert np.allclose(lhs, rhs, atol=1e-8 * max(1.0, abs(a) + abs(b)))

    @given(seed=st.integers(0, 2**16))
    @settings(max_examples=15, deadline=None)
    def test_fft_kernel_is_linear_and_shift_invariant(self, seed):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(512)
        # linearity
        assert np.allclose(
            filtfilt_fft(B, A, 3.0 * x), 3.0 * filtfilt_fft(B, A, x), atol=1e-9
        )
        # zero-phase: filtering a reversed signal = reversing the filtered
        # signal (time-reversal symmetry of |H|²) — interior only, the
        # odd-extension edges differ
        fwd = filtfilt_fft(B, A, x)
        rev = filtfilt_fft(B, A, x[::-1])[::-1]
        assert np.allclose(fwd[64:-64], rev[64:-64], atol=1e-6)

    @given(seed=st.integers(0, 2**16), n=st.integers(250, 400))
    @settings(max_examples=15, deadline=None)
    def test_filtfilt_output_bounded_by_input_energy(self, seed, n):
        """|H| ≤ 1 for Butterworth ⇒ no steady-state energy gain. The
        bound holds only AWAY from the ends: with a 24-sample pad the
        IIR edge transient (tail ~300 samples) can transiently exceed
        input RMS near the boundaries — hypothesis found a 1.35×
        overshoot at n=60 — so the property is asserted on the
        interior (worst interior ratio over 3000 seeds: 0.91)."""
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(n)
        y = filtfilt(B, A, x)
        core = slice(100, -100)
        assert np.sqrt(np.mean(y[core] ** 2)) <= np.sqrt(
            np.mean(x[core] ** 2)
        ) * 1.05


class TestAsofAgainstNaive:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_quadratic_reference(self, spark, seed):
        from eeg_data_lake_spark.operators.joins import asof_join

        rng = np.random.default_rng(seed)
        left = pd.DataFrame(
            {
                "lid": np.arange(40),
                "k": rng.integers(0, 5, 40),
                "t": rng.integers(0, 100, 40),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 25),
                "rt": rng.integers(0, 100, 25),
                "pay": np.arange(25) * 10,
            }
        )

        def naive(row):
            m = right[(right.k == row.k) & (right.rt <= row.t)]
            if m.empty:
                return None
            m = m.sort_values(["rt", "pay"])  # greatest (rt, pay) wins
            return int(m.iloc[-1].pay)

        expected = {int(r.lid): naive(r) for r in left.itertuples()}
        ldf = spark.createDataFrame(left.astype("int64"))
        rdf = spark.createDataFrame(right.astype("int64"))
        got = {
            r.lid: (None if r.pay is None else int(r.pay))
            for r in asof_join(
                ldf, rdf, on="k", left_ts="t", right_ts="rt",
                tie_breakers=("pay",),
            ).collect()
        }
        assert got == expected


class TestZScoreInvariant:
    def test_window_zscore_unit_moments(self, spark):
        from eeg_data_lake_spark.pipeline.silver import zscore

        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "trial_id": np.repeat(np.arange(4), 50).astype("int64"),
                "channel": ["AF3"] * 200,
                "value": rng.standard_normal(200) * 7 + 3,
            }
        )
        out = zscore(spark.createDataFrame(pdf)).toPandas()
        for _, g in out.groupby("trial_id"):
            assert abs(g.z.mean()) < 1e-9
            assert abs(g.z.std(ddof=1) - 1.0) < 1e-9
