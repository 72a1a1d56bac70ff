"""Visualization consumption: plot-ready trial extraction + renderers.

The reference's consumption endpoint (/root/reference/data_visualize.py:22-50)
reads ONE bronze trial, band-pass filters each channel, standardizes,
and plots every channel over time to a PNG. This module splits that
into the two things it actually is:

- ``plot_ready_trial`` — the DATA step, in Spark: filter one trial out
  of bronze (partition-prunable at 100 TB — plotting one trial never
  scans the lake), band-pass + standardize per channel with the U1/U2
  grouped-map kernels, return tidy (channel, sample_idx, time_sec, y)
  rows ordered for drawing. This is the part that must scale; it's a
  two-Python-stage narrow plan over a tiny filtered slice.
- ``render_signal_svg`` — the DRAW step, driver-side over the
  collected (small) result: a dependency-free SVG writer (one polyline
  per channel) so rendering is testable in this container.
  ``render_signal_png`` delegates to matplotlib when it is installed
  (import-gated, same contract as the reference's plt path).
"""

from __future__ import annotations

import html
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark import schemas
from eeg_data_lake_spark.functions.signal import (
    bandpass_by_group,
    standardize_by_group,
)

try:  # pragma: no cover - not installed in this container
    import matplotlib  # type: ignore  # noqa: F401

    _HAVE_MPL = True
except ImportError:
    _HAVE_MPL = False


def plot_ready_trial(
    bronze: DataFrame,
    source_file: str,
    lowcut: float = 1.0,
    highcut: float = 40.0,
    fs: float = schemas.FS,
    order: int = 4,
) -> DataFrame:
    """One trial's channels, filtered + standardized, ordered for
    drawing — the exact series data_visualize.py feeds to plt.plot
    (bandpass_filter(low=1, high=40, fs=128, order=4) then
    StandardScaler), as a tidy DataFrame instead of a wide pandas
    transpose."""
    trial = bronze.filter(F.col("source_file") == source_file).select(
        "source_file", "channel", "sample_idx", "time_sec", "value"
    )
    filt = bandpass_by_group(
        trial,
        group_cols=["channel"],
        order_col="sample_idx",
        value_col="value",
        lowcut=lowcut,
        highcut=highcut,
        fs=fs,
        order=order,
    )
    std = standardize_by_group(filt, ["channel"], "value_filt", out_col="y")
    return std.select(
        "channel", "sample_idx", "time_sec", "y"
    ).orderBy("channel", "sample_idx")


_PALETTE = [
    "#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
    "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0",
]


def render_signal_svg(
    pdf: pd.DataFrame,
    path: str,
    width: int = 960,
    height: int = 480,
    title: str = "EEG signals over time",
) -> str:
    """Render (channel, sample_idx, y) rows as an SVG line chart —
    one polyline per channel, linear x over sample_idx, shared y
    scale — with zero third-party dependencies. Returns ``path``."""
    if not len(pdf):
        raise ValueError("nothing to render: empty plot data")
    margin = 40
    x0, x1 = float(pdf["sample_idx"].min()), float(pdf["sample_idx"].max())
    y0, y1 = float(pdf["y"].min()), float(pdf["y"].max())
    xspan = (x1 - x0) or 1.0
    yspan = (y1 - y0) or 1.0
    iw, ih = width - 2 * margin, height - 2 * margin

    def sx(x: float) -> float:
        return margin + (x - x0) / xspan * iw

    def sy(y: float) -> float:
        return margin + (y1 - y) / yspan * ih  # y grows downward in SVG

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<title>{html.escape(title)}</title>',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for i, (channel, grp) in enumerate(sorted(pdf.groupby("channel"))):
        grp = grp.sort_values("sample_idx")
        pts = " ".join(
            f"{sx(float(x)):.2f},{sy(float(y)):.2f}"
            for x, y in zip(grp["sample_idx"], grp["y"])
        )
        color = _PALETTE[i % len(_PALETTE)]
        parts.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1" '
            f'points="{pts}" data-channel="{html.escape(str(channel))}"/>'
        )
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(parts))
    return path


def render_signal_png(
    pdf: pd.DataFrame, path: str, title: str = "EEG signals over time"
) -> str:  # pragma: no cover - matplotlib absent in this container
    """matplotlib twin of the reference's plt loop
    (/root/reference/data_visualize.py:41-50); import-gated exactly
    like the multimodal codec."""
    if not _HAVE_MPL:
        raise ImportError(
            "matplotlib not installed; use render_signal_svg (same data)"
        )
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 6))
    for channel, grp in sorted(pdf.groupby("channel")):
        grp = grp.sort_values("sample_idx")
        plt.plot(grp["sample_idx"], grp["y"], label=str(channel))
    plt.xlabel("Time (samples)")
    plt.ylabel("EEG amplitude (standardized)")
    plt.title(title)
    plt.legend()
    plt.savefig(path)
    plt.close()
    return path
