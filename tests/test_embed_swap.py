"""The encoder swap contract (VERDICT r4 task 5): a 'neural' encoder
— a fixed-weight 2-layer numpy MLP — injected through the
predict_batch_udf seam of with_text_embedding. Proves the documented
one-function swap is real: only (make_model, encode_batch) differ,
the wiring (Arrow batching, schema, narrow plan, determinism) is the
same code, and retrieval over the swapped embeddings still ranks
duplicates first."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.embed import (
    _ngram_features,
    with_text_embedding,
)

DIM = 16
_IN = 256   # MLP input: n-gram buckets folded to 256
_HID = 32


def _mlp():
    """(make_model, encode_batch) for the injected 'neural' encoder.
    Defined as CLOSURES so cloudpickle ships them by value to Spark
    workers (a test module isn't importable worker-side — exactly the
    situation a user-supplied encoder is in).

    make_model is the 'checkpoint load': fixed-seed weights, created
    once per worker exactly where a torch state_dict would load.
    encode is a 2-layer MLP over folded signed n-gram counts:
    x @ W1 -> tanh -> @ W2 -> L2 norm — same signature as
    _encode_batch, which is THE swap."""

    def make_model():
        rng = np.random.default_rng(42)
        return (
            rng.standard_normal((_IN, _HID)).astype(np.float32)
            / np.sqrt(_IN),
            rng.standard_normal((_HID, DIM)).astype(np.float32)
            / np.sqrt(_HID),
        )

    def encode(texts, dim, model):
        w1, w2 = model
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, s in enumerate(texts):
            idx, sign = _ngram_features(s)
            x = np.zeros(_IN, dtype=np.float32)
            np.add.at(
                x, (idx % _IN).astype(np.int64), sign.astype(np.float32)
            )
            e = np.tanh(x @ w1) @ w2
            out[i] = e / max(float(np.linalg.norm(e)), 1e-12)
        return out

    return make_model, encode


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 0
        (2, "completely different subject matter entirely"),
        (3, "stochastic gradient descent optimizes neural networks"),
        (4, "stochastic gradient descent optimizes deep networks"),  # near-dup of 3
        (5, "unrelated text about cooking pasta with garlic"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_swap_changes_only_the_encoder(corpus):
    """Same wiring function, two encoders: identical output schema and
    plan shape (one narrow Arrow-batched projection, no exchange), and
    the default path is untouched by the parameterization."""
    base = with_text_embedding(corpus, dim=DIM)
    make_model, encode = _mlp()
    mlp = with_text_embedding(
        corpus, dim=DIM, make_model=make_model, encode_batch=encode
    )
    assert base.schema == mlp.schema
    for df in (base, mlp):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow map either way
    # embeddings genuinely differ (the swap did something) ...
    b = {r.doc_id: np.array(r.embedding) for r in base.collect()}
    m = {r.doc_id: np.array(r.embedding) for r in mlp.collect()}
    assert not np.allclose(b[0], m[0])
    # ... and both are unit-norm float32[DIM]
    for v in list(b.values()) + list(m.values()):
        assert v.shape == (DIM,) and abs(np.linalg.norm(v) - 1) < 1e-5


def test_mlp_encoder_is_deterministic_across_partitionings(corpus):
    make_model, encode = _mlp()
    one = with_text_embedding(
        corpus.coalesce(1), dim=DIM, make_model=make_model,
        encode_batch=encode,
    )
    many = with_text_embedding(
        corpus.repartition(5), dim=DIM, make_model=make_model,
        encode_batch=encode,
    )
    a = {r.doc_id: r.embedding for r in one.collect()}
    b = {r.doc_id: r.embedding for r in many.collect()}
    assert a == b  # model 'load' is seed-fixed per worker


def test_retrieval_still_ranks_with_swapped_encoder(corpus):
    """The point of the contract: downstream retrieval code runs
    unchanged on the swapped encoder's column and near-duplicates
    still rank closest."""
    emb = {
        r.doc_id: np.array(r.embedding, dtype=np.float64)
        for r in with_text_embedding(
            corpus, dim=DIM, make_model=_mlp()[0],
            encode_batch=_mlp()[1],
        ).collect()
    }

    def top1(q):
        scored = sorted(
            ((float(emb[q] @ emb[d]), d) for d in emb if d != q),
            reverse=True,
        )
        return scored[0][1]

    assert top1(0) == 1 and top1(1) == 0
    assert top1(3) == 4 and top1(4) == 3
