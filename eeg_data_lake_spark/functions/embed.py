"""Embedding-column generation (U4: the reference encodes images with
CLIP ViT-B/32 driver-side, /root/reference/test_train.py:66-93; here
the inference runs *inside* Spark via ``pyspark.ml.functions.
predict_batch_udf`` — the batched-inference API real model serving
uses).

The model itself is STUBBED (no torch/CLIP in this container): a
deterministic hash-seeded Gaussian projection, L2-normalized like CLIP
embeddings. Swapping in a real encoder changes only ``_encode_batch``
— the predict_batch_udf wiring (Arrow batches, batch_size, tensor
shapes, array<float> column) is exactly what a GPU-backed encoder
needs, including the one-model-per-worker reuse predict_batch_udf
guarantees via its make_predict_fn factory.

Scale notes: inference is a narrow map — no shuffle; batch_size
bounds peak memory per worker; at 100 TB throughput scales with
executors (and predict_batch_udf keeps the model loaded per worker,
not per batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBED_DIM = 64
BATCH_SIZE = 256


def _encode_batch(texts: np.ndarray, dim: int) -> np.ndarray:
    """STUB encoder: deterministic per-text hash-seeded unit vector.
    Replace with a real model's forward pass; signature stays."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, s in enumerate(texts):
        seed = int.from_bytes(
            hashlib.md5(str(s).encode()).digest()[:8], "little"
        )
        v = np.random.default_rng(seed).standard_normal(dim)
        out[i] = (v / np.linalg.norm(v)).astype(np.float32)
    return out


def with_text_embedding(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Attach an ``array<float>`` embedding column computed with
    predict_batch_udf (batched, model-per-worker)."""
    from pyspark.ml.functions import predict_batch_udf

    def make_predict_fn():
        # runs once per Python worker: the place a real model loads
        return lambda batch: _encode_batch(batch, dim)

    embed = predict_batch_udf(
        make_predict_fn,
        return_type=T.ArrayType(T.FloatType()),
        batch_size=BATCH_SIZE,
    )
    return df.withColumn(out_col, embed(text_col))
