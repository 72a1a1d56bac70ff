"""Spectral kernels: Parseval identity, sine-peak band localization,
and the distributed band-power operator vs a single-node numpy run."""

from __future__ import annotations

import numpy as np
import pytest

from eeg_data_lake_spark.functions.spectral import (
    EEG_BANDS,
    band_power,
    band_power_by_group,
    periodogram,
)

FS = 128.0


def test_parseval_identity_rect_window():
    rng = np.random.default_rng(3)
    for n in (256, 255):  # even and odd lengths hit both one-sided folds
        x = rng.standard_normal(n)
        freqs, psd = periodogram(x, FS)
        assert freqs[0] == 0.0 and freqs[-1] == pytest.approx(
            FS / 2 if n % 2 == 0 else FS / 2 * (n - 1) / n
        )
        np.testing.assert_allclose(psd.sum() * FS / n, (x * x).mean(), rtol=1e-10)


def test_pure_sine_lands_in_its_band():
    t = np.arange(512) / FS
    for f, band in [(2.0, "delta"), (6.0, "theta"), (10.0, "alpha"), (20.0, "beta")]:
        x = np.sin(2 * np.pi * f * t)
        p = band_power(x, FS)
        total = sum(p.values())
        assert p[band] / total > 0.99, (f, band, p)


def test_hann_window_suppresses_leakage():
    # off-bin sine: rectangular leaks into neighbors, hann concentrates
    t = np.arange(512) / FS
    x = np.sin(2 * np.pi * 10.3 * t)
    rect = band_power(x, FS)
    hann = band_power(x, FS, window="hann")
    r_alpha = rect["alpha"] / sum(rect.values())
    h_alpha = hann["alpha"] / sum(hann.values())
    assert h_alpha > r_alpha
    with pytest.raises(ValueError, match="unknown window"):
        periodogram(x, FS, window="kaiser")


def test_band_power_by_group_matches_numpy(spark):
    rng = np.random.default_rng(9)
    rows = []
    for g in range(4):
        x = np.sin(2 * np.pi * (4 + 2 * g) * np.arange(200) / FS)
        x += 0.05 * rng.standard_normal(200)
        rows += [(g, i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g int, idx int, value double")
    got = {
        r.g: r
        for r in band_power_by_group(
            df, ("g",), "idx", "value", fs=FS
        ).collect()
    }
    assert len(got) == 4
    for g in range(4):
        x = np.array([v for gg, _i, v in rows if gg == g])
        want = band_power(x, FS)
        assert got[g].n_samples == 200
        for name in EEG_BANDS:
            np.testing.assert_allclose(
                getattr(got[g], f"{name}_power"), want[name], rtol=1e-9
            )
        rels = [getattr(got[g], f"{n}_rel") for n in EEG_BANDS]
        np.testing.assert_allclose(sum(rels), 1.0, rtol=1e-9)
