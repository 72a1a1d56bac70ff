"""Visualization consumption: the plot-ready data step must reproduce
data_visualize.py's series semantics (bandpass → standardize per
channel), and the SVG renderer must emit one polyline per channel."""

from __future__ import annotations

import re

import numpy as np
import pytest

from eeg_data_lake_spark import fixtures
from eeg_data_lake_spark.pipeline import bronze_from_lines
from eeg_data_lake_spark.viz import plot_ready_trial, render_signal_svg


@pytest.fixture(scope="module")
def bronze(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("viz_raw")
    # clean lines: the dirty-row variants exercise ingest, but a trial
    # with a duplicated channel line has no well-defined drawing order
    # (the reference's transpose would garble it identically)
    fixtures.write_mindbigdata_csvs(str(raw), n_files=2, include_bad_rows=False)
    return bronze_from_lines(spark, str(raw))


def test_plot_ready_is_standardized_per_channel(spark, bronze):
    src = bronze.select("source_file").first().source_file
    pdf = plot_ready_trial(bronze, src).toPandas()
    assert set(pdf.columns) == {"channel", "sample_idx", "time_sec", "y"}
    assert pdf["channel"].nunique() >= 2
    for _ch, grp in pdf.groupby("channel"):
        y = grp["y"].to_numpy()
        # StandardScaler semantics: zero mean, unit population std
        assert abs(y.mean()) < 1e-9
        assert np.isclose(y.std(), 1.0)
    # each channel's samples are the full contiguous 0..n-1 range of
    # the one requested trial (channel lengths may differ by design —
    # MindBigData lines carry ±a few samples)
    for _ch, grp in pdf.groupby("channel"):
        idx = np.sort(grp["sample_idx"].to_numpy())
        assert (idx == np.arange(len(idx))).all()


def test_svg_has_one_polyline_per_channel(spark, bronze, tmp_path):
    src = bronze.select("source_file").first().source_file
    pdf = plot_ready_trial(bronze, src).toPandas()
    out = render_signal_svg(pdf, str(tmp_path / "trial.svg"))
    svg = open(out).read()
    polys = re.findall(r'data-channel="([^"]+)"', svg)
    assert sorted(polys) == sorted(pdf["channel"].unique())
    assert svg.startswith("<svg")
    # every polyline has as many points as the channel has samples
    n = (pdf["channel"] == polys[0]).sum()
    first_pts = re.search(r'points="([^"]+)"', svg).group(1)
    assert len(first_pts.split()) == n


def test_empty_plot_data_raises(tmp_path):
    import pandas as pd

    with pytest.raises(ValueError, match="empty"):
        render_signal_svg(
            pd.DataFrame({"channel": [], "sample_idx": [], "y": []}),
            str(tmp_path / "x.svg"),
        )
