"""Signal UDF layer (U1/U2): numeric validation of the numpy
Butterworth+filtfilt kernel against analytically-known sinusoids, and
the Spark grouped-map operators built on it."""

from __future__ import annotations

import numpy as np
import pytest

from eeg_data_lake_spark.functions.signal import (
    bandpass_by_group,
    butter_bandpass,
    filtfilt,
    lfilter,
    standardize_by_group,
)

FS = 128.0


def _gain(b, a, f, fs=FS):
    z = np.exp(2j * np.pi * f / fs)
    return abs(np.polyval(b, z) / np.polyval(a, z))


class TestFilterDesign:
    def test_band_edges_at_minus_3db(self):
        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        assert _gain(b, a, 1.0) == pytest.approx(2 ** -0.5, rel=1e-6)
        assert _gain(b, a, 40.0) == pytest.approx(2 ** -0.5, rel=1e-6)

    def test_passband_unity_stopband_rejection(self):
        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        for f in (6.0, 10.0, 20.0):
            assert _gain(b, a, f) == pytest.approx(1.0, abs=1e-3)
        assert _gain(b, a, 0.1) < 1e-3
        assert _gain(b, a, 60.0) < 1e-3

    def test_stable_poles(self):
        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        assert np.abs(np.roots(a)).max() < 1.0

    def test_bad_band_raises(self):
        with pytest.raises(ValueError):
            butter_bandpass(40.0, 1.0, FS)
        with pytest.raises(ValueError):
            butter_bandpass(1.0, 65.0, FS)  # above Nyquist


class TestFiltfilt:
    def test_zero_phase_and_unity_inband(self):
        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        ts = np.arange(0, 4, 1 / FS)
        x = np.sin(2 * np.pi * 10 * ts)
        y = filtfilt(b, a, x)
        core = slice(64, -64)  # ignore edge transients
        rms = lambda v: np.sqrt(np.mean(v**2))  # noqa: E731
        assert rms(y[core]) / rms(x[core]) == pytest.approx(1.0, abs=5e-3)
        lag = np.argmax(np.correlate(y[core], x[core], "full")) - (
            len(x[core]) - 1
        )
        assert lag == 0  # forward-backward ⇒ zero phase

    def test_dc_and_outband_removed(self):
        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        ts = np.arange(0, 4, 1 / FS)
        core = slice(64, -64)
        dc = filtfilt(b, a, np.ones_like(ts) * 3.0)
        assert np.abs(dc[core]).max() < 1e-9
        hi = filtfilt(b, a, np.sin(2 * np.pi * 60 * ts))
        assert np.sqrt(np.mean(hi[core] ** 2)) < 0.05

    def test_short_input_raises(self):
        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        with pytest.raises(ValueError):
            filtfilt(b, a, np.zeros(10))

    def test_fft_kernel_same_spectral_contract(self):
        from eeg_data_lake_spark.functions.signal import filtfilt_fft

        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        ts = np.arange(0, 4, 1 / FS)
        core = slice(64, -64)
        rms = lambda v: np.sqrt(np.mean(v**2))  # noqa: E731
        y = filtfilt_fft(b, a, np.sin(2 * np.pi * 10 * ts))
        assert rms(y[core]) == pytest.approx(2 ** -0.5, abs=5e-3)
        hi = filtfilt_fft(b, a, np.sin(2 * np.pi * 60 * ts))
        assert rms(hi[core]) < 0.05
        dc = filtfilt_fft(b, a, np.ones_like(ts))
        assert np.abs(dc[core]).max() < 1e-6

    def test_fft_and_exact_agree_in_interior(self):
        """The two kernels implement the same operator; their interior
        difference is bounded by the exact path's 24-sample-pad edge
        transient (IIR tail ~300 samples), hence the loose tolerance."""
        from eeg_data_lake_spark.functions.signal import filtfilt_fft

        b, a = butter_bandpass(1.0, 40.0, FS, order=4)
        ts = np.arange(0, 8, 1 / FS)
        rng = np.random.default_rng(3)
        x = np.sin(2 * np.pi * 10 * ts) + 0.2 * rng.standard_normal(len(ts))
        core = slice(128, -128)
        d = filtfilt(b, a, x)[core] - filtfilt_fft(b, a, x)[core]
        assert np.abs(d).max() < 0.05

    def test_lfilter_matches_impulse_response(self):
        # y of an impulse == b when a == [1]
        b = np.array([0.5, 0.25, 0.125])
        y, _ = lfilter(b, np.array([1.0]), np.array([1.0, 0, 0, 0]))
        assert np.allclose(y, [0.5, 0.25, 0.125, 0.0])


class TestSparkOperators:
    @pytest.fixture(scope="class")
    def signal_df(self, spark):
        ts = np.arange(0, 4, 1 / FS)
        rows = []
        for trial, (f, label) in enumerate([(10.0, "inband"), (55.0, "outband")]):
            x = np.sin(2 * np.pi * f * ts)
            rows += [
                (trial, label, i, float(v)) for i, v in enumerate(x)
            ]
        return spark.createDataFrame(
            rows, "trial_id long, channel string, sample_idx int, value double"
        )

    def test_bandpass_by_group(self, signal_df):
        out = bandpass_by_group(
            signal_df,
            group_cols=("trial_id", "channel"),
            order_col="sample_idx",
            value_col="value",
            lowcut=1.0,
            highcut=40.0,
            fs=FS,
        ).toPandas()
        core = (out.sample_idx > 64) & (out.sample_idx < 448)
        rms = lambda v: float(np.sqrt(np.mean(np.square(v))))  # noqa: E731
        inband = out[(out.channel == "inband") & core]
        outband = out[(out.channel == "outband") & core]
        assert rms(inband.value_filt) == pytest.approx(
            rms(inband.value), abs=5e-3
        )
        assert rms(outband.value_filt) < 0.05 * rms(outband.value)

    def test_short_group_passthrough(self, spark):
        df = spark.createDataFrame(
            [(1, i, float(i)) for i in range(5)],
            "trial_id long, sample_idx int, value double",
        )
        out = bandpass_by_group(
            df, ("trial_id",), "sample_idx", "value", 1.0, 40.0, FS
        ).toPandas()
        assert np.allclose(out.value_filt, out.value)

    def test_standardize_matches_window_zscore(self, spark, sf_dir):
        """U2 equivalence: grouped-map standardization == SQL window
        z-score, up to the sample/population std factor."""
        from pyspark.sql import functions as F

        from eeg_data_lake_spark.workload.registry import t

        e = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
        pdf = (
            standardize_by_group(e, ("user_id",), "value")
            .toPandas()
            .sort_values("event_id")
        )
        grp = pdf.groupby("user_id").value
        expected = (pdf.value - grp.transform("mean")) / grp.transform(
            lambda s: s.std(ddof=0)
        )
        assert np.allclose(pdf.value_std, expected, atol=1e-9)


def test_standardize_by_group_nan_sample_does_not_zero_group(spark):
    """One NaN sample must not make the group's std NaN and silently
    zero every valid sample; valid rows standardize against the
    NaN-skipping moments, NaN rows stay NaN."""
    import math

    rows = [("g", float(v)) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("g", float("nan"))
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {
        i: r.value_std
        for i, r in enumerate(
            standardize_by_group(df, ("grp",), "value")
            .orderBy("value")
            .collect()
        )
    }
    finite = [v for v in out.values() if v is not None and not math.isnan(v)]
    assert len(finite) == 4 and any(abs(v) > 0.5 for v in finite)
    mean = sum(finite) / 4
    assert abs(mean) < 1e-9  # real z-scores, not zeros
    nan_vals = [v for v in out.values() if v is None or math.isnan(v)]
    assert len(nan_vals) == 1
