"""dHash kernel parity, multi-index Hamming join correctness vs a
brute-force reference, and the registered z12 query."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.multimodal import dhash64, resize_bilinear
from eeg_data_lake_spark.operators.hamming import hamming_pairs_64
from eeg_data_lake_spark.workload import REGISTRY


def test_dhash_matches_reference_and_invariance():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (40, 40))
    h = dhash64(img)
    small = resize_bilinear(img, 8, 9)
    want = 0
    for r in range(8):
        for c in range(8):
            want = (want << 1) | int(small[r, c] > small[r, c + 1])
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert h == want
    # gradient hash is invariant to brightness and contrast shifts
    assert dhash64(img * 0.5 + 40.0) == h
    # and changes when content changes
    other = rng.uniform(0, 255, (40, 40))
    assert dhash64(other) != h


def test_hamming_join_matches_bruteforce(spark):
    rng = np.random.default_rng(9)
    base = [int(x) for x in rng.integers(-(2**62), 2**62, 30)]
    fps = list(enumerate(base))
    # plant near-dups: flip 1, 3 and 5 bits of fp 0
    fps.append((100, base[0] ^ (1 << 7)))
    fps.append((101, base[0] ^ 0b10101))
    fps.append((102, base[0] ^ (0b11111 << 20)))
    df = spark.createDataFrame(fps, "doc_id long, fp long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_pairs_64(df, fp_col="fp").collect()
    }
    want = {}
    for i, (ia, fa) in enumerate(fps):
        for ib, fb in fps[i + 1 :]:
            d = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    assert (0, 100) in got and got[(0, 100)] == 1
    assert (0, 101) in got and got[(0, 101)] == 3
    assert (0, 102) not in got  # 5 bits — beyond threshold


def test_max_dist_guard():
    with pytest.raises(ValueError):
        hamming_pairs_64(None, max_dist=4)


def test_z12_runs_and_identical_payloads_pair(spark, sf_dir):
    out = REGISTRY["z12_phash_neardup"].spark_fn(spark, sf_dir)
    rows = out.collect()
    assert all(r.hamming <= 3 for r in rows)
    again = REGISTRY["z12_phash_neardup"].spark_fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
