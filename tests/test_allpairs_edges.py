"""Edge cases for the exact all-pairs operator: empty corpora and
one-sided block groups must yield empty results, not numpy AxisErrors;
the block path must agree with the broadcast path even when blocks are
tiny/empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.allpairs import cosine_neardup_pairs


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_empty_corpus_yields_no_pairs(spark):
    v = _vecs(spark, [])
    assert cosine_neardup_pairs(v, tau=0.5).count() == 0


def test_tiny_blocks_match_broadcast_path(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.95, 0.05]),
        (5, [0.0, 0.0, 1.0]),
    ]
    v = _vecs(spark, rows)
    want = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_neardup_pairs(v, tau=0.8).collect()
    }
    # force the block path with 1-row blocks: several (ba, bb) groups
    # are one-sided or empty — the guards must hold and results match
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_neardup_pairs(
            v, tau=0.8, broadcast_cutover=0, rows_per_block=1
        ).collect()
    }
    assert got == want and len(want) >= 2


def test_zero_vector_is_inert_not_nan(spark):
    """A zero-norm embedding must not poison score rows with NaN (the
    semdedup bug class): it pairs with nothing, and every real pair is
    still found on both the broadcast and block paths."""
    rows = [
        (1, [0.0, 0.0, 0.0]),  # zero vector
        (2, [1.0, 0.0, 0.0]),
        (3, [0.98, 0.02, 0.0]),
        (4, [0.0, 1.0, 0.0]),
    ]
    v = _vecs(spark, rows)
    for kwargs in ({}, {"broadcast_cutover": 0, "rows_per_block": 1}):
        got = {
            (r.vec_a, r.vec_b): r.cosine
            for r in cosine_neardup_pairs(v, tau=0.8, **kwargs).collect()
        }
        assert set(got) == {(2, 3)}
        assert all(c == c for c in got.values())  # no NaNs


def test_band_power_ignores_non_finite_samples(spark):
    import math

    from eeg_data_lake_spark.functions.spectral import band_power_by_group

    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([1.0, -1.0, 1.0, -1.0])]
        + [(1, 4, float("nan")), (2, 0, float("nan"))],
        "g long, i long, value double",
    )
    out = {
        r.g: r.asDict()
        for r in band_power_by_group(
            df, ["g"], "i", "value", fs=4.0
        ).collect()
    }
    # group 1: NaN skipped, powers finite, relatives sum to ~1
    r1 = out[1]
    rels = [v for k, v in r1.items() if k.endswith("_rel")]
    assert all(not math.isnan(v) for k, v in r1.items() if k.endswith("_power"))
    assert abs(sum(rels) - 1.0) < 1e-9
    # group 2: all-NaN → consistent zeros, never half-NaN
    r2 = out[2]
    assert all(v == 0.0 for k, v in r2.items() if k.endswith(("_power", "_rel")))


def test_null_and_empty_embeddings_ignored(spark):
    """A NULL or empty embedding must be dropped at entry (it can never
    clear tau), not crash np.array/np.linalg.norm with an opaque
    object-array error."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, None),
        (4, []),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = cosine_neardup_pairs(df, tau=0.9)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    assert got == {(1, 2)}
