"""MLlib LSH wrappers: planted near-duplicates must be recovered and
candidate sets must be sound (distances correct, below threshold)."""

from __future__ import annotations

import numpy as np
import pytest

from eeg_data_lake_spark.ml.lsh import brp_similarity_join, minhash_neardup_candidates


class TestBRP:
    def test_planted_close_pair_found_and_distance_exact(self, spark):
        rng = np.random.default_rng(31)
        vecs = {i: rng.normal(0, 10, 8) for i in range(40)}
        vecs[100] = vecs[0] + 0.01  # planted near-identical pair (0, 100)
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        pairs = {
            (r.id_a, r.id_b): r.dist
            for r in brp_similarity_join(
                df, distance_threshold=1.0, num_hash_tables=6
            ).collect()
        }
        assert (0, 100) in pairs
        expected = float(np.linalg.norm(vecs[100] - vecs[0]))
        assert pairs[(0, 100)] == pytest.approx(expected, abs=1e-6)
        # soundness: every reported pair is genuinely under the threshold
        assert all(d < 1.0 for d in pairs.values())


class TestMinHashLSH:
    def test_planted_token_dup_found(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(0, base), (1, base + " iota")]  # jaccard dist 1/9
        rng = np.random.default_rng(37)
        words = [f"w{i}" for i in range(200)]
        for i in range(2, 40):
            rows.append((i, " ".join(rng.choice(words, 12, replace=False))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): r.jaccard_dist
            for r in minhash_neardup_candidates(
                df, jaccard_distance_threshold=0.5, num_hash_tables=6
            ).collect()
        }
        assert (0, 1) in got
        assert got[(0, 1)] == pytest.approx(1.0 / 9.0, abs=1e-6)
        # soundness: approxSimilarityJoin reports EXACT jaccard distance
        # for candidates, all under the threshold
        assert all(d <= 0.5 for d in got.values())

    def test_empty_text_rows_are_skipped_not_fatal(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "a b c d"), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        got = minhash_neardup_candidates(df, jaccard_distance_threshold=0.9)
        ids = {i for r in got.collect() for i in (r.id_a, r.id_b)}
        assert 2 not in ids and 3 not in ids
        assert (0, 1) in {(r.id_a, r.id_b) for r in got.collect()}
