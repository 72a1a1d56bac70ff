"""bench.py's host-anchor table: value_normalized must anchor to the
band-matched host class and go NULL on an unrecognized host instead
of scaling against the wrong machine's constant (round-9 verdict
task 8)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_known_host_band_matches():
    a = bench._match_anchor(
        {"numpy_gemm_sec": 0.0033, "python_loop_sec": 0.1204}
    )
    assert a is not None and a["label"] == "32c-cotenant-2026"
    assert a["norm_loop_sec"] == 0.1143


def test_unknown_host_returns_none():
    # faster machine (GEMM below band), slower interpreter, and a
    # both-out sample: all must refuse to normalize
    assert bench._match_anchor(
        {"numpy_gemm_sec": 0.0005, "python_loop_sec": 0.04}
    ) is None
    assert bench._match_anchor(
        {"numpy_gemm_sec": 0.0033, "python_loop_sec": 0.4}
    ) is None
    assert bench._match_anchor(
        {"numpy_gemm_sec": 0.02, "python_loop_sec": 0.1204}
    ) is None


def test_diverged_calibration_returns_none():
    # both probes inside their own bands but telling OPPOSITE host
    # stories (loop fast, gemm at the slow edge — the round-10 erratic
    # steal signature): scaling by the loop anchor would inflate
    # value_normalized above even the raw wall, so refuse to normalize
    assert bench._match_anchor(
        {"numpy_gemm_sec": 0.0090, "python_loop_sec": 0.0986}
    ) is None


def test_band_edges_are_inclusive():
    a = bench.HOST_ANCHORS[0]
    # a ratio-consistent sample sitting ON the gemm band edge and ON
    # the ratio band edge must still match (inclusive bounds)
    gemm = a["gemm_band"][0]
    loop = gemm / a["ratio_band"][0]  # ratio exactly at the low edge
    assert a["loop_band"][0] <= loop <= a["loop_band"][1]
    assert bench._match_anchor(
        {"numpy_gemm_sec": gemm, "python_loop_sec": loop}
    ) is a
