"""Multimodal columns (north-star): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed with
Arrow-batched ``mapInPandas``.

The *plumbing* here is real and tested — binary column handling,
schema, batch iteration, per-byte feature math. The actual image
codec is STUBBED: this container has no PIL/cv2/torchvision, so
``decode_image_features`` tries a real decoder import and falls back
to ``_fake_decode`` — a deterministic, documented stand-in that
derives (width, height, format) from the payload bytes. Swapping in a
real codec changes only the body of ``_decode_one``.

Scale notes: all operators are NARROW (mapInPandas over whatever
partitioning the scan produced) — no shuffle; 100 TB of images stream
through executors one Arrow batch at a time. Payload bytes should live
in parquet binary columns colocated with their metadata, so column
pruning lets metadata-only queries skip the heavy bytes entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

#: schema of the decoded-feature rows appended by decode_image_features
DECODE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "n_bytes int, mean_byte double, std_byte double"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    With no real media on disk, the deterministic payload is the UTF-8
    encoding of the text column — byte-for-byte reproducible in the
    DuckDB oracle via encode(). Real pipelines read parquet binary
    columns directly; everything downstream only sees ``payload``.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_meta",
        F.struct(
            F.lit("fake/utf8").alias("fmt"),
            F.length(F.col("payload")).alias("n_bytes"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for an image codec (STUB — see module
    docstring): pretends the payload is a tiny image whose dimensions
    are functions of the byte content. Replace with PIL when present.
    """
    n = len(payload)
    checksum = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    width = 16 + checksum % 48
    height = 16 + (checksum >> 8) % 48
    return ("fake/utf8", width, height) if n else ("empty", 0, 0)


def _decode_one(payload: bytes) -> tuple[str, int, int]:
    if _HAVE_PIL:  # pragma: no cover - real codec path
        raise NotImplementedError(
            "real image decode not wired: container lacks test images"
        )
    return _fake_decode(payload)


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract each payload: format/dimensions from the
    (stubbed) codec, byte statistics computed for real with numpy.
    Narrow mapInPandas — schema, batching and math are production
    shape; only the codec body is fake."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                fmt, width, height = _decode_one(raw)
                arr = np.frombuffer(raw, dtype=np.uint8)
                out.append(
                    (
                        doc_id,
                        fmt,
                        width,
                        height,
                        len(raw),
                        float(arr.mean()) if len(arr) else 0.0,
                        float(arr.std()) if len(arr) else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "n_bytes", "mean_byte", "std_byte",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling over a binary payload: split the byte
    stream into ``n_frames`` equal chunks and emit one scalar row per
    frame — (id, n_bytes, frame_idx, frame_sig). Pure JVM expression —
    the byte slicing/sampling pattern for real video is identical, with
    the checksum swapped for a frame decode.

    The signature is ``md5(hex(frame_bytes))``: hex-ing first keeps the
    checksum portable (an oracle engine whose md5 only accepts text can
    slice the hex string at 2× byte offsets and get the identical
    digest). Scalar output rows — never an array column — so downstream
    consumers (and row canonicalizers) see only sortable primitives."""
    n_bytes = F.length(F.col(payload_col))
    step = F.greatest(F.floor(n_bytes / n_frames).cast("int"), F.lit(1))
    return (
        df.select(
            id_col,
            n_bytes.alias("n_bytes"),
            F.col(payload_col).alias("__payload"),
            step.alias("__step"),
            F.posexplode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias(
                "frame_idx", "__i"
            ),
        )
        .select(
            id_col,
            "n_bytes",
            "frame_idx",
            F.md5(
                F.hex(
                    F.substring(
                        F.col("__payload"),
                        (F.col("frame_idx") * F.col("__step") + 1).cast("int"),
                        F.col("__step"),
                    )
                )
            ).alias("frame_sig"),
        )
    )


#: schema of the resize rows appended by resize_image_features
RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, out_width int, "
    "out_height int, mean_px double, resized_md5 string"
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic (h, w) float array standing in for decoded pixels:
    the payload bytes tiled to the fake-decoded dimensions (STUB — a
    real codec returns the actual pixel grid; everything downstream of
    this function is real math)."""
    if not len(payload):
        return np.zeros((1, 1), dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return np.resize(arr, (height, width))


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Real vectorized bilinear resampling (align_corners=False, the
    OpenCV/PIL convention): output pixel centers map to source
    coordinates, the four neighbors blend by fractional distance.
    This is the production resize kernel — nothing stubbed."""
    h, w = img.shape
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = img[y0[:, None], x0[None, :]] * (1 - wx) + img[y0[:, None], x1[None, :]] * wx
    bot = img[y1[:, None], x0[None, :]] * (1 - wx) + img[y1[:, None], x1[None, :]] * wx
    return top * (1 - wy) + bot * wy


def resize_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Decode (stubbed) → resize (real bilinear) → emit resized stats
    and a checksum of the uint8-quantized resized grid. Narrow
    mapInPandas like the other multimodal ops — 100 TB of payloads
    stream through one Arrow batch at a time, no shuffle; the checksum
    keeps results comparable without shipping pixel arrays around."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                _fmt, width, height = _decode_one(raw)
                img = _fake_pixels(raw, max(width, 1), max(height, 1))
                resized = resize_bilinear(img, out_h, out_w)
                q = np.clip(np.rint(resized), 0, 255).astype(np.uint8)
                out.append(
                    (
                        doc_id,
                        img.shape[1],
                        img.shape[0],
                        out_w,
                        out_h,
                        float(resized.mean()),
                        hashlib.md5(q.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_width", "src_height",
                    "out_width", "out_height", "mean_px", "resized_md5",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(fn, RESIZE_SCHEMA)
