"""SemDeDup semantics: NMS chain rule, dropped-witness invariant,
recall against the exact all-pairs near-dup set."""

from __future__ import annotations

import numpy as np
import pytest

from eeg_data_lake_spark.ml.semdedup import _nms_scan, semdedup_flags
from eeg_data_lake_spark.workload import REGISTRY
from eeg_data_lake_spark.workload.joins_advanced import COSINE_NEARDUP_TAU
from eeg_data_lake_spark.workload.registry import t


def test_nms_chain_keeps_endpoints():
    """a~b and b~c above tau but a·c below: NMS keeps a AND c (b is
    suppressed by a; c is only compared against the RETAINED set)."""
    a = np.array([1.0, 0.0])
    c = np.array([0.0, 1.0])
    b = (a + c) / np.linalg.norm(a + c)
    ids = np.array([10, 20, 30], dtype=np.int64)
    ids_s, kept, best = _nms_scan(ids, np.stack([a, b, c]), tau=0.6)
    assert ids_s.tolist() == [10, 20, 30]
    assert kept.tolist() == [True, False, True]
    assert np.isnan(best[0])
    assert best[1] == pytest.approx(np.dot(a, b))
    assert best[2] == pytest.approx(0.0)  # vs retained {a} only


def test_nms_zero_norm_vector_is_inert():
    """A zero-norm embedding normalizes to the zero vector (norm
    clamped): cosine 0 against everything, so it is kept and — the
    regression — does NOT poison later comparisons with NaN, which
    previously flagged every subsequent item in the cluster as a
    duplicate."""
    z = np.array([0.0, 0.0])
    a = np.array([1.0, 0.0])
    a2 = np.array([0.999, 0.01]) / np.linalg.norm([0.999, 0.01])
    c = np.array([0.0, 1.0])
    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    ids_s, kept, best = _nms_scan(ids, np.stack([z, a, a2, c]), tau=0.9)
    assert ids_s.tolist() == [1, 2, 3, 4]
    # zero vec kept; a kept (cos 0 vs z); a2 suppressed by a; c kept
    assert kept.tolist() == [True, True, False, True]
    assert not np.isnan(best[1:]).any()


def test_flags_deterministic_and_witnessed(spark, sf_dir):
    out = REGISTRY["z09_semdedup"].spark_fn(spark, sf_dir)
    rows = out.collect()
    again = REGISTRY["z09_semdedup"].spark_fn(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    v = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in t(spark, sf_dir, "embeddings").collect()
    }
    assert len(rows) == len(v)  # every vector decided exactly once
    kept_by_cluster: dict[int, list[int]] = {}
    for r in rows:
        if r.kept:
            kept_by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    for r in rows:
        if r.kept:
            continue
        # dropped ⇒ an earlier KEPT in-cluster witness at ≥ tau
        sims = [
            float(
                np.dot(v[r.vec_id], v[k])
                / (np.linalg.norm(v[r.vec_id]) * np.linalg.norm(v[k]))
            )
            for k in kept_by_cluster.get(r.cluster, [])
            if k < r.vec_id
        ]
        assert sims and max(sims) >= COSINE_NEARDUP_TAU
        assert max(sims) == pytest.approx(r.max_kept_cosine, abs=1e-6)


def test_pair_capture_beats_random_baseline(spark, sf_dir):
    """Fraction of exact q36 near-dup pairs landing in one cluster (the
    pairs SemDeDup can act on) must beat the random-collision baseline
    Σ(n_c/n)². The test embeddings are near-uniform with incidental
    close pairs (0% of near-dup pairs share a label at sf0.001), so no
    quantizer can score high recall here — cosine locality still has
    to beat chance, or the clustering step is adding nothing."""
    pairs = [
        (r.vec_a, r.vec_b)
        for r in REGISTRY["q36_embedding_neardup_pairs"]
        .spark_fn(spark, sf_dir)
        .collect()
    ]
    if len(pairs) < 5:
        pytest.skip("too few exact near-dup pairs at this sf")
    flags = REGISTRY["z09_semdedup"].spark_fn(spark, sf_dir).collect()
    cl = {r.vec_id: r.cluster for r in flags}
    sizes: dict[int, int] = {}
    for r in flags:
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
    n = len(flags)
    baseline = sum((s / n) ** 2 for s in sizes.values())
    same = sum(cl[a] == cl[b] for a, b in pairs) / len(pairs)
    assert same > baseline
