"""Embedding-column generation (U4: the reference encodes images with
CLIP ViT-B/32 driver-side, /root/reference/test_train.py:66-93; here
the inference runs *inside* Spark via ``pyspark.ml.functions.
predict_batch_udf`` — the batched-inference API real model serving
uses).

The encoder is REAL (no torch/CLIP in this container, so it is a
non-neural one): feature-hashed character 3-grams (the hashing trick,
Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning" — the representation fastText/Vowpal Wabbit use) followed by
a seeded Gaussian random projection to ``dim`` (Johnson-Lindenstrauss;
Achlioptas 2003 shows such projections preserve inner products), then
L2 normalization like CLIP embeddings. Texts sharing most of their
n-grams land close in cosine and lexically disjoint texts land near
orthogonal — a measurable semantic(-lexical) property the previous
hash-seeded stand-in could not have, and the property the test suite
pins. Swapping in a neural encoder changes only ``_encode_batch`` —
the predict_batch_udf wiring (Arrow batches, batch_size, tensor
shapes, array<float> column) is exactly what a GPU-backed encoder
needs, including the one-projection-per-worker reuse that
predict_batch_udf guarantees via its make_predict_fn factory (the
16 MB projection matrix is the "model load").

Scale notes: inference is a narrow map — no shuffle; batch_size
bounds peak memory per worker; at 100 TB throughput scales with
executors (and predict_batch_udf keeps the model loaded per worker,
not per batch). Per batch the n-gram hash is vectorized numpy
(splitmix64 over packed byte triples) and the projection is one
row-gather + segment-sum — no per-character Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBED_DIM = 64
BATCH_SIZE = 256

#: feature-hashing bucket count (2^16 buckets keeps 3-gram collisions
#: rare enough that hashed-tf cosine tracks true n-gram cosine)
HASH_DIM = 1 << 16

#: fixed seed for the projection matrix — the "model weights"; every
#: worker generates the identical matrix, so embeddings are
#: deterministic across executors, runs, and partitionings
PROJECTION_SEED = 0x5EED_E18D


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 — a well-mixed
    stable hash (Python's hash() is salted per process and unusable
    across workers)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _ngram_features(s: str) -> tuple[np.ndarray, np.ndarray]:
    """(bucket indices, ±1 signs) of the text's character 3-grams
    under the hashing trick. The sign hash (bit 63) makes collisions
    cancel in expectation instead of biasing counts upward (the
    signed-hashing variant from the feature-hashing paper). Texts too
    short for a 3-gram map to one fixed sentinel bucket so every such
    text gets the same unit vector rather than a zero vector (zero
    norms poison downstream cosines). NULL text maps to the sentinel
    too — str(None) would otherwise embed it as the literal word
    'none', colliding with real text."""
    if s is None or (isinstance(s, float) and np.isnan(s)):
        b = np.empty(0, dtype=np.uint8)
    else:
        b = np.frombuffer(str(s).lower().encode("utf-8"), dtype=np.uint8)
    if b.size < 3:
        h = _mix64(np.array([0xE417], dtype=np.uint64))
    else:
        codes = (
            b[:-2].astype(np.uint64) << np.uint64(16)
            | b[1:-1].astype(np.uint64) << np.uint64(8)
            | b[2:].astype(np.uint64)
        )
        h = _mix64(codes)
    idx = (h % np.uint64(HASH_DIM)).astype(np.int64)
    sign = 1.0 - 2.0 * (h >> np.uint64(63)).astype(np.float64)
    return idx, sign


def hashed_tf_vector(s: str) -> np.ndarray:
    """The exact (un-projected) signed hashed-tf vector in HASH_DIM
    dims — the representation the projection approximates; exposed so
    tests can check the JL property against ground truth."""
    idx, sign = _ngram_features(s)
    v = np.zeros(HASH_DIM, dtype=np.float64)
    np.add.at(v, idx, sign)
    return v


#: per-process projection cache, keyed by (seed, rows, dim). This
#: module is importable on executors, so with worker reuse the global
#: SURVIVES across tasks and across queries (guide §4.5): the "model
#: load" — 4.2 M Gaussians for the text projection — is then paid once
#: per worker process instead of once per predict_batch_udf instance
#: (every query call builds a fresh UDF, whose make_predict_fn would
#: otherwise regenerate the matrix on every worker). Determinism is
#: unaffected: the matrix is a pure function of the fixed seed.
_PROJ_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _gaussian_projection(seed: int, rows: int, dim: int) -> np.ndarray:
    key = (seed, rows, dim)
    got = _PROJ_CACHE.get(key)
    if got is None:
        rng = np.random.default_rng(seed)
        got = (rng.standard_normal((rows, dim)) / np.sqrt(dim)).astype(
            np.float32
        )
        _PROJ_CACHE[key] = got
    return got


def _make_projection(dim: int) -> np.ndarray:
    """(HASH_DIM, dim) float32 Gaussian JL projection, fixed seed,
    scaled 1/sqrt(dim) so inner products are preserved in
    expectation."""
    return _gaussian_projection(PROJECTION_SEED, HASH_DIM, dim)


def _encode_batch(
    texts: np.ndarray, dim: int, proj: np.ndarray
) -> np.ndarray:
    """Hashed-3-gram + random-projection embeddings for one Arrow
    batch, L2-normalized. Projected per text (one row-gather +
    vector-matrix product each) so peak worker memory is
    O(longest_text_ngrams x dim), independent of how many long
    documents share a batch — a batch-wide concatenated gather would
    amplify batch text bytes ~4*dim-fold in one allocation."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, s in enumerate(texts):
        idx, sign = _ngram_features(s)
        e = sign.astype(np.float32) @ proj[idx]
        out[i] = e / max(float(np.linalg.norm(e)), 1e-12)
    return out


#: tiny-image patch side: images are decoded, bilinear-resampled to
#: PATCH x PATCH, contrast-normalized, then JL-projected — the
#: "tiny images" descriptor (Torralba, Fergus & Freeman 2008), the
#: classic non-neural stand-in for a learned image embedding
IMAGE_PATCH = 16

IMAGE_PROJECTION_SEED = 0x1A6E_5EED


def _make_image_projection(dim: int) -> np.ndarray:
    """(PATCH*PATCH, dim) float32 Gaussian JL projection for the
    flattened normalized patch (same per-process cache as the text
    projection — see _PROJ_CACHE)."""
    return _gaussian_projection(
        IMAGE_PROJECTION_SEED, IMAGE_PATCH * IMAGE_PATCH, dim
    )


def _encode_image_batch(
    payloads: np.ndarray, dim: int, proj: np.ndarray
) -> np.ndarray:
    """Real image embeddings for one Arrow batch of binary payloads:
    decode through the production codec seam (real PNG/PPM/PGM,
    documented fallback otherwise), resize to the tiny-image patch
    with the real bilinear kernel, contrast-normalize (mean/std — the
    descriptor is brightness- and contrast-invariant by construction),
    JL-project, L2-normalize. Flat (zero-variance) patches share one
    fixed unit vector — two blank images are identical, not
    zero-vector poison."""
    from eeg_data_lake_spark.functions.multimodal import (
        _decode_full,
        resize_bilinear,
    )

    out = np.empty((len(payloads), dim), dtype=np.float32)
    flat_sentinel = None
    for i, payload in enumerate(payloads):
        raw = bytes(payload) if payload is not None else b""
        _fmt, _w, _h, grid = _decode_full(raw)
        patch = resize_bilinear(grid, IMAGE_PATCH, IMAGE_PATCH).ravel()
        std = float(patch.std())
        if std < 1e-9:
            if flat_sentinel is None:
                v = proj.sum(axis=0)
                flat_sentinel = (
                    v / max(float(np.linalg.norm(v)), 1e-12)
                ).astype(np.float32)
            out[i] = flat_sentinel
            continue
        feat = ((patch - patch.mean()) / std).astype(np.float32)
        e = feat @ proj
        out[i] = e / max(float(np.linalg.norm(e)), 1e-12)
    return out


def with_image_embedding(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Attach an ``array<float>`` image-embedding column (U4's image
    half): same predict_batch_udf wiring as the text encoder, encoder
    body = real decode → real bilinear tiny-image → JL projection.
    A neural image encoder (the reference's CLIP ViT-B/32) swaps in by
    replacing ``_encode_image_batch``; batching, schema, and plan are
    unchanged."""
    from pyspark.ml.functions import predict_batch_udf

    def make_predict_fn():
        proj = _make_image_projection(dim)
        return lambda batch: _encode_image_batch(batch, dim, proj)

    embed = predict_batch_udf(
        make_predict_fn,
        return_type=T.ArrayType(T.FloatType()),
        batch_size=BATCH_SIZE,
    )
    return df.withColumn(out_col, embed(payload_col))


def with_text_embedding(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = EMBED_DIM,
    make_model=None,
    encode_batch=None,
) -> DataFrame:
    """Attach an ``array<float>`` embedding column computed with
    predict_batch_udf (batched, model-loaded-once-per-worker).

    ``make_model`` / ``encode_batch`` ARE the documented swap seam,
    made explicit: ``make_model()`` runs once per Python worker (the
    model load — defaults to the JL projection; a neural encoder's
    weights would load here) and ``encode_batch(texts, dim, model)``
    encodes one Arrow batch to (n, dim) float32 (defaults to
    ``_encode_batch``). Everything else — Arrow batching, batch_size,
    array<float> schema, the narrow no-shuffle plan — is shared
    verbatim between encoders; tests/test_embed_swap.py injects a
    fixed-weight 2-layer numpy MLP through this seam to prove the
    one-function swap is real."""
    from pyspark.ml.functions import predict_batch_udf

    load = make_model if make_model is not None else (
        lambda: _make_projection(dim)
    )
    enc = encode_batch if encode_batch is not None else _encode_batch

    def make_predict_fn():
        model = load()
        return lambda batch: enc(batch, dim, model)

    embed = predict_batch_udf(
        make_predict_fn,
        return_type=T.ArrayType(T.FloatType()),
        batch_size=BATCH_SIZE,
    )
    return df.withColumn(out_col, embed(text_col))
