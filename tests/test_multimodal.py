"""Multimodal plumbing: binary round-trip, decode-stub determinism,
frame sampling shape."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from eeg_data_lake_spark.functions.multimodal import (
    _fake_decode,
    attach_binary_payload,
    decode_image_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "héllo wörld"), (3, ""), (4, "x" * 1000)],
        "doc_id long, text string",
    )


def test_payload_bytes_roundtrip(docs):
    rows = {r.doc_id: r for r in attach_binary_payload(docs).collect()}
    assert bytes(rows[2].payload) == "héllo wörld".encode()
    assert rows[2].payload_meta.n_bytes == len("héllo wörld".encode())
    assert rows[3].payload_meta.n_bytes == 0


def test_decode_features_match_local_numpy(docs):
    out = {r.doc_id: r for r in
           decode_image_features(attach_binary_payload(docs)).collect()}
    raw = "héllo wörld".encode()
    arr = np.frombuffer(raw, dtype=np.uint8)
    assert out[2].n_bytes == len(raw)
    assert out[2].mean_byte == pytest.approx(float(arr.mean()))
    assert out[2].std_byte == pytest.approx(float(arr.std()))
    fmt, w, h = _fake_decode(raw)
    assert (out[2].fmt, out[2].width, out[2].height) == (fmt, w, h)
    assert out[3].fmt == "empty" and out[3].n_bytes == 0


def test_decode_deterministic_across_runs(docs):
    a = sorted(map(tuple, decode_image_features(attach_binary_payload(docs)).collect()))
    b = sorted(map(tuple, decode_image_features(attach_binary_payload(docs)).collect()))
    assert a == b


def test_frame_sample_shape_and_determinism(docs):
    rows = frame_sample(attach_binary_payload(docs)).collect()
    out: dict[int, dict[int, str]] = {}
    for r in rows:
        out.setdefault(r.doc_id, {})[r.frame_idx] = r.frame_sig
    assert all(sorted(sigs) == [0, 1, 2, 3] for sigs in out.values())
    # distinct content ⇒ distinct signatures; same content ⇒ same
    assert list(out[1].values()) != list(out[2].values())
    big = {r.frame_idx: r for r in rows if r.doc_id == 4}
    assert big[0].n_bytes == 1000
    # frames of an all-'x' payload are identical chunks ⇒ equal sigs
    assert len({r.frame_sig for r in big.values()}) == 1
    # signature is md5 over the UPPERCASE hex of the byte slice —
    # reproducible off-Spark (this is what makes the oracle portable)
    raw = b"hello world"  # step = max(11 // 4, 1) = 2
    want = hashlib.md5(raw[2:4].hex().upper().encode()).hexdigest()
    assert out[1][1] == want


def test_md5_matches_hashlib(docs):
    from pyspark.sql import functions as F

    d = attach_binary_payload(docs).select("doc_id", F.md5("payload").alias("h"))
    rows = {r.doc_id: r.h for r in d.collect()}
    assert rows[1] == hashlib.md5(b"hello world").hexdigest()


def test_text_embedding_deterministic_unit_norm(spark, docs=None):
    import numpy as np

    from eeg_data_lake_spark.functions.embed import EMBED_DIM, with_text_embedding

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: np.array(r.embedding) for r in with_text_embedding(df).collect()}
    assert all(len(v) == EMBED_DIM for v in rows.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in rows.values())
    assert np.allclose(rows[1], rows[3])          # same text, same vector
    assert not np.allclose(rows[1], rows[2])      # different text differs
    again = {r.doc_id: np.array(r.embedding) for r in with_text_embedding(df).collect()}
    assert np.allclose(rows[1], again[1])         # deterministic across runs


class TestResize:
    def test_bilinear_kernel_exact_values(self):
        import numpy as np

        from eeg_data_lake_spark.functions.multimodal import resize_bilinear

        img = np.array([[0.0, 10.0], [20.0, 30.0]])
        # identity resize returns the original grid
        np.testing.assert_allclose(resize_bilinear(img, 2, 2), img)
        # 2x2 -> 4x4, align_corners=False: hand-computed neighbors
        want = np.array(
            [
                [0.0, 2.5, 7.5, 10.0],
                [5.0, 7.5, 12.5, 15.0],
                [15.0, 17.5, 22.5, 25.0],
                [20.0, 22.5, 27.5, 30.0],
            ]
        )
        np.testing.assert_allclose(resize_bilinear(img, 4, 4), want)
        # downsample averages the blended neighborhood, mean preserved
        big = np.arange(16, dtype=float).reshape(4, 4)
        small = resize_bilinear(big, 2, 2)
        assert small.shape == (2, 2)
        np.testing.assert_allclose(small.mean(), big.mean())

    def test_resize_operator_rows_and_determinism(self, spark, sf_dir):
        from eeg_data_lake_spark.functions.multimodal import (
            attach_binary_payload,
            resize_image_features,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        d = attach_binary_payload(docs)
        a = resize_image_features(d).collect()
        b = resize_image_features(d).collect()
        assert len(a) == 50
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        r = a[0]
        assert r.out_width == 8 and r.out_height == 8
        assert len(r.resized_md5) == 32 and r.mean_px > 0


class TestPCM:
    """Real PCM16LE codec path (decode_pcm_samples and friends)."""

    def test_decode_known_bytes(self):
        from eeg_data_lake_spark.functions.multimodal import decode_pcm_samples

        # 'ab' = 0x61 0x62 → LE int16 0x6261 = 25185; '¡' = 0xC2 0xA1
        # → 0xA1C2 = 41410 - 65536 = -24126 (sign from the high byte)
        v = decode_pcm_samples("ab¡".encode())
        assert v.tolist() == [25185, -24126]

    def test_odd_trailing_byte_dropped_and_empty(self):
        from eeg_data_lake_spark.functions.multimodal import decode_pcm_samples

        assert decode_pcm_samples(b"abc").tolist() == [25185]
        assert decode_pcm_samples(b"").tolist() == []
        assert decode_pcm_samples(b"x").tolist() == []

    def test_features_match_local_numpy(self, docs):
        from eeg_data_lake_spark.functions.multimodal import (
            decode_pcm_features,
            decode_pcm_samples,
        )

        out = {
            r.doc_id: r
            for r in decode_pcm_features(attach_binary_payload(docs)).collect()
        }
        # doc 3 is empty (no samples) → skipped entirely
        assert 3 not in out
        v = decode_pcm_samples("héllo wörld".encode()).astype(np.float64)
        r = out[2]
        assert r.n_samples == v.size
        assert r.rms == pytest.approx(float(np.sqrt((v**2).mean())))
        assert r.peak == int(np.abs(v).max())
        c = v - v.mean()
        assert r.mean_crossings == int(np.count_nonzero(c[:-1] * c[1:] < 0))
        assert r.mean_sample == pytest.approx(float(v.mean()))

    def test_frame_rms_strides(self, spark):
        from eeg_data_lake_spark.functions.multimodal import pcm_frame_rms

        # 20 samples → step=2, frames 0..7 cover samples 0..15, the
        # trailing 4 samples are dropped (the q49 stride convention)
        df = spark.createDataFrame(
            [(1, bytes(range(40)))], "doc_id long, payload binary"
        )
        rows = {r.frame_idx: r for r in pcm_frame_rms(df, n_frames=8).collect()}
        assert sorted(rows) == list(range(8))
        assert all(r.n_frame_samples == 2 for r in rows.values())
        # short doc: 3 samples → step=1, only frames 0..2 emitted
        df2 = spark.createDataFrame(
            [(2, bytes([1, 0, 2, 0, 3, 0, 1]))], "doc_id long, payload binary"
        )
        rows2 = {r.frame_idx: r for r in pcm_frame_rms(df2, n_frames=8).collect()}
        assert sorted(rows2) == [0, 1, 2]
        assert rows2[2].frame_rms == pytest.approx(3.0)


class TestAudioSpectral:
    def test_pure_tone_lands_in_its_band(self, spark):
        """A 2 kHz sine encoded as PCM16LE must be dominated by the
        high_mid (1-3 kHz) band; a 100 Hz sine by bass."""
        import numpy as np

        from eeg_data_lake_spark.functions.multimodal import decode_pcm_samples
        from eeg_data_lake_spark.functions.spectral import band_power
        from eeg_data_lake_spark.workload.multimodal import (
            _AUDIO_BANDS,
            _AUDIO_FS,
        )

        for freq, want in ((2000.0, "high_mid"), (100.0, "bass")):
            t = np.arange(4096) / _AUDIO_FS
            raw = (20000 * np.sin(2 * np.pi * freq * t)).astype("<i2").tobytes()
            v = decode_pcm_samples(raw).astype(np.float64)
            v = v - v.mean()
            bp = band_power(v, _AUDIO_FS, _AUDIO_BANDS)
            assert max(bp, key=bp.get) == want

    def test_z13_runs_deterministic(self, spark, sf_dir):
        from eeg_data_lake_spark.workload import REGISTRY

        a = REGISTRY["z13_audio_spectral"].spark_fn(spark, sf_dir).collect()
        b = REGISTRY["z13_audio_spectral"].spark_fn(spark, sf_dir).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) > 0
        assert all(r.dominant_band in (
            "bass", "low_mid", "high_mid", "treble") for r in a)


class TestRealEncoder:
    """The encoder is REAL (hashed 3-grams + JL projection), not a
    hash-seeded stand-in: lexical similarity must be measurable in the
    output cosines, and the projection must track the exact hashed-tf
    cosine it approximates. A per-text-seeded random vector (the old
    stub) fails all of these — any two distinct texts were orthogonal
    on average regardless of content."""

    def _cos(self, a, b):
        import numpy as np

        return float(
            np.dot(a, b)
            / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
        )

    def test_similar_texts_close_disjoint_texts_far(self):
        import numpy as np

        from eeg_data_lake_spark.functions.embed import (
            EMBED_DIM,
            _encode_batch,
            _make_projection,
        )

        proj = _make_projection(EMBED_DIM)
        a = "the quick brown fox jumps over the lazy dog"
        b = "the quick brown fox jumps over the lazy cat"   # 1-word edit
        c = "zzyzx qwfp vjkl mxbn ghrt uioe"                # disjoint
        e = _encode_batch(np.array([a, b, c]), EMBED_DIM, proj)
        sim_ab = self._cos(e[0], e[1])
        sim_ac = self._cos(e[0], e[2])
        assert sim_ab > 0.8, sim_ab       # near-dup texts land close
        assert abs(sim_ac) < 0.45, sim_ac  # disjoint texts ~orthogonal
        assert sim_ab > sim_ac + 0.4

    def test_projection_tracks_exact_hashed_tf_cosine(self):
        import numpy as np

        from eeg_data_lake_spark.functions.embed import (
            EMBED_DIM,
            _encode_batch,
            _make_projection,
            hashed_tf_vector,
        )

        texts = [
            "spark structured streaming watermark",
            "spark structured streaming checkpoint",
            "duckdb quantile oracle parity",
            "completely unrelated pelican filament",
        ]
        proj = _make_projection(EMBED_DIM)
        emb = _encode_batch(np.array(texts), EMBED_DIM, proj)
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                exact = self._cos(
                    hashed_tf_vector(texts[i]), hashed_tf_vector(texts[j])
                )
                approx = self._cos(emb[i], emb[j])
                # JL at dim=64: inner products preserved within ~3/sqrt(dim)
                assert abs(exact - approx) < 0.4, (texts[i], texts[j], exact, approx)

    def test_spark_path_matches_local_encoder_exactly(self, spark):
        import numpy as np

        from eeg_data_lake_spark.functions.embed import (
            EMBED_DIM,
            _encode_batch,
            _make_projection,
            with_text_embedding,
        )

        texts = ["alpha beta gamma", "x", "", "alpha beta gamma delta"]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.doc_id: np.array(r.embedding, dtype=np.float32)
            for r in with_text_embedding(df).collect()
        }
        want = _encode_batch(
            np.array(texts), EMBED_DIM, _make_projection(EMBED_DIM)
        )
        for i in range(len(texts)):
            assert np.allclose(got[i], want[i], atol=1e-6), i
        # short texts share the sentinel bucket -> identical unit vector
        assert np.allclose(got[1], got[2])
        assert abs(np.linalg.norm(got[2]) - 1.0) < 1e-5


class TestImageEncoder:
    """The image encoder is REAL: decode through the production codec,
    bilinear tiny-image patch, contrast normalization, JL projection.
    The properties below are impossible for a byte-hash stand-in."""

    def _embs(self, imgs_and_filters):
        import numpy as np

        from eeg_data_lake_spark.functions.embed import (
            EMBED_DIM,
            _encode_image_batch,
            _make_image_projection,
        )
        from eeg_data_lake_spark.functions.imagecodec import encode_png

        payloads = np.array(
            [bytes(encode_png(img, ft)) for img, ft in imgs_and_filters],
            dtype=object,
        )
        return _encode_image_batch(
            payloads, EMBED_DIM, _make_image_projection(EMBED_DIM)
        )

    def test_codec_invariance_noise_and_scale(self):
        import numpy as np

        rng = np.random.default_rng(3)
        base = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        noisy = np.clip(
            base.astype(np.int64) + rng.integers(-8, 9, size=base.shape),
            0,
            255,
        ).astype(np.uint8)
        other = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        big = np.kron(base, np.ones((2, 2), dtype=np.uint8))
        e = self._embs(
            [(base, 0), (base, 4), (noisy, 2), (other, 1), (big, 3)]
        )
        cos = lambda a, b: float(np.dot(a, b))  # noqa: E731 (unit vecs)
        # identical pixels through DIFFERENT PNG filter types: the
        # decoded grid must be bit-identical, so cosine is exactly 1
        assert cos(e[0], e[1]) > 1 - 1e-6
        assert cos(e[0], e[2]) > 0.95          # small noise: near-dup
        assert abs(cos(e[0], e[3])) < 0.5       # unrelated: far
        assert cos(e[0], e[4]) > 0.8            # 2x upscale: same scene

    def test_flat_images_share_sentinel_and_brightness_invariance(self):
        import numpy as np

        flat_dark = np.full((10, 10), 7, dtype=np.uint8)
        flat_bright = np.full((6, 6), 200, dtype=np.uint8)
        e = self._embs([(flat_dark, 0), (flat_bright, 0)])
        assert np.allclose(e[0], e[1])
        assert abs(np.linalg.norm(e[0]) - 1.0) < 1e-5

    def test_spark_image_embedding_matches_local(self, spark):
        import numpy as np

        from eeg_data_lake_spark.functions.embed import (
            EMBED_DIM,
            _encode_image_batch,
            _make_image_projection,
            with_image_embedding,
        )
        from eeg_data_lake_spark.functions.imagecodec import encode_png

        rng = np.random.default_rng(11)
        payloads = [
            bytes(encode_png(rng.integers(0, 256, size=(9, 7), dtype=np.uint8), i % 5))
            for i in range(8)
        ]
        df = spark.createDataFrame(
            list(enumerate(payloads)), "doc_id long, payload binary"
        )
        got = {
            r.doc_id: np.array(r.embedding, dtype=np.float32)
            for r in with_image_embedding(df).collect()
        }
        want = _encode_image_batch(
            np.array(payloads, dtype=object),
            EMBED_DIM,
            _make_image_projection(EMBED_DIM),
        )
        assert all(np.allclose(got[i], want[i], atol=1e-6) for i in range(8))


def test_z17_image_topk_runs_and_finds_similar_images(spark, sf_dir):
    from eeg_data_lake_spark.workload.multimodal import z17_image_embedding_topk

    rows = z17_image_embedding_topk(spark, sf_dir).collect()
    assert len(rows) == 15  # 5 queries x top-3
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
    assert all(r.neighbor_id != r.query_id for r in rows)


def test_null_text_embeds_as_sentinel_not_literal_none(spark):
    import numpy as np

    from eeg_data_lake_spark.functions.embed import with_text_embedding

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "none"), (3, "None")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: np.array(r.embedding)
        for r in with_text_embedding(df).collect()
    }
    assert np.allclose(got[0], got[1])       # NULL == empty == sentinel
    assert not np.allclose(got[0], got[2])   # literal 'none' is distinct
    assert np.allclose(got[2], got[3])       # case-folded real text


def test_quarantine_catches_planted_corruption(spark, sf_dir):
    """z21's machinery end-to-end at row granularity: planted CRC and
    decode-bomb payloads land in the quarantine side with the failed
    rule tag and the codec's own error text; every clean payload
    passes; nothing is silently skipped (pass + quarantine == input)."""
    from pyspark.sql import functions as F

    from eeg_data_lake_spark.functions.multimodal import (
        attach_image_payload,
        plant_payload_corruption,
        with_decode_status,
    )
    from eeg_data_lake_spark.operators.expectations import enforce
    from eeg_data_lake_spark.workload.registry import t

    d = attach_image_payload(t(spark, sf_dir, "documents").limit(70))
    st = with_decode_status(plant_payload_corruption(d))
    passed, quar = enforce(
        st, {"image_decodes": F.col("decode_ok")}, mode="quarantine"
    )
    qrows = quar.collect()
    prows = passed.collect()
    assert len(qrows) + len(prows) == 70
    for r in qrows:
        assert r._failed_rules == ["image_decodes"]
        if r.doc_id % 7 == 3:
            assert r.decode_err.startswith("CRC mismatch")
        elif r.doc_id % 7 == 5:
            assert "declares" in r.decode_err  # bomb guard fired
        else:
            raise AssertionError(f"unplanted doc {r.doc_id} quarantined")
    assert {r.doc_id % 7 for r in qrows} == {3, 5}
    for r in prows:
        assert r.doc_id % 7 not in (3, 5)
        assert r.decode_ok and r.decode_err is None


def test_registry_z21_matches_oracle(spark, sf_dir):
    from eeg_data_lake_spark.workload.registry import REGISTRY
    from tests.oracle_utils import compare, run_oracle

    e = REGISTRY["z21_multimodal_quarantine"]
    problems = compare(
        e.spark_fn(spark, sf_dir), run_oracle(e.oracle, sf_dir), "z21"
    )
    assert problems == [], problems
