"""Deterministic synthetic EEG fixtures (FIXTURES.md §1-2).

Re-implements the reference's seeded signal generator semantics
(/root/reference/pilots/pilot_bronze.py:47-57): 5 channels of pure
sinusoids + 0.1σ Gaussian noise at 128 Hz. Known frequencies give
analytic expectations (mean≈0, std≈0.707·A, rms≈std, zcr≈2f/s) used by
the property tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from eeg_data_lake_spark.schemas import CHANNELS, FS

#: (channel, wave, freq_hz) per /root/reference/pilots/pilot_bronze.py:50-56
CHANNEL_WAVES = [
    ("AF3", "sin", 8.0),
    ("AF4", "cos", 10.0),
    ("T7", "sin", 6.0),
    ("T8", "cos", 12.0),
    ("Pz", "sin", 4.0),
]


def make_signal_df(seconds: float = 2.0, seed: int = 100) -> pd.DataFrame:
    """Wide 5-channel frame, one row per timepoint."""
    rng = np.random.default_rng(seed)
    n = int(seconds * FS)
    t = np.arange(n) / FS
    data = {}
    for ch, wave, freq in CHANNEL_WAVES:
        base = np.sin(2 * np.pi * freq * t) if wave == "sin" else np.cos(2 * np.pi * freq * t)
        data[ch] = base + 0.1 * rng.standard_normal(n)
    return pd.DataFrame(data, columns=CHANNELS)


def write_pilot_trials(out_dir: str, n_trials: int = 3, seconds: float = 2.0) -> list[str]:
    """Headered wide CSVs named trial_<id>.csv (FIXTURES.md §1)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_trials):
        p = os.path.join(out_dir, f"trial_{i}.csv")
        make_signal_df(seconds, seed=100 + i).to_csv(p, index=False)
        paths.append(p)
    return paths


def write_mindbigdata_csvs(
    out_dir: str,
    n_files: int = 2,
    seconds: float = 2.0,
    include_bad_rows: bool = True,
) -> list[str]:
    """Headerless row-per-channel CSVs named
    MindBigData_Imagenet_<headset>_<synset>_<imageid>_<take>_<session>.csv
    (FIXTURES.md §2). Optionally appends an unknown-channel row (dropped
    by the whitelist) and a non-numeric token (null after cast)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_files):
        name = f"MindBigData_Imagenet_Insight_n{i:08d}_{i}_0_{i % 3}.csv"
        p = os.path.join(out_dir, name)
        wide = make_signal_df(seconds, seed=200 + i)
        lines = []
        for ch in CHANNELS:
            vals = ",".join(f"{v:.6f}" for v in wide[ch].to_numpy())
            lines.append(f"{ch},{vals}")
        if include_bad_rows:
            lines.append("BOGUS,1.0,2.0,3.0")
            # NOTE: this extra line re-uses CHANNELS[0], so after bronze
            # parsing the file holds DUPLICATE (source_file, channel,
            # sample_idx) keys for that channel at idx 0 and 2 (idx 1 is
            # the null token). Order-dependent consumers (lag windows,
            # per-group sorts) are nondeterministic over dirty fixtures —
            # use include_bad_rows=False for those tests, as
            # test_viz/test_medallion do.
            lines.append(f"{CHANNELS[0]},0.5,not_a_number,0.25")
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        paths.append(p)
    return paths
