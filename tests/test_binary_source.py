"""binaryFile source: the built-in scan that brings raw multimodal
assets (images/audio/video as opaque bytes) into the lakehouse —
one row per file, glob pruning at listing time, size guard before
content read. Complements functions/multimodal.py, whose decode UDFs
consume exactly this shape."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.readers import read_binary_dir


def _write_assets(root):
    os.makedirs(root, exist_ok=True)
    payloads = {
        "a.img": b"\x89PNGfakeimagebytes" * 10,
        "b.img": b"\x89PNGother" * 3,
        "notes.txt": b"not an image",
    }
    for name, data in payloads.items():
        with open(os.path.join(root, name), "wb") as fh:
            fh.write(data)
    return payloads


def test_binary_dir_reads_bytes_with_metadata(spark, tmp_path):
    root = str(tmp_path / "assets")
    payloads = _write_assets(root)
    df = read_binary_dir(spark, root)
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert bytes(rows[name].content) == data
        assert rows[name].length == len(data)


def test_binary_dir_glob_prunes_at_listing(spark, tmp_path):
    root = str(tmp_path / "assets")
    _write_assets(root)
    df = read_binary_dir(spark, root, glob="*.img")
    names = {os.path.basename(r.path) for r in df.select("path").collect()}
    assert names == {"a.img", "b.img"}


def test_binary_dir_size_guard(spark, tmp_path):
    root = str(tmp_path / "assets")
    _write_assets(root)
    df = read_binary_dir(spark, root, glob="*.img", max_bytes=50)
    names = {os.path.basename(r.path) for r in df.collect()}
    assert names == {"b.img"}  # a.img is 180 bytes, pruned


def test_binary_source_feeds_multimodal_features(spark, tmp_path):
    """End-to-end: binaryFile scan → the same byte-stats expressions
    the documents-table multimodal queries use (q47 shape) — proving
    the decode pipeline is source-agnostic."""
    root = str(tmp_path / "assets")
    _write_assets(root)
    df = read_binary_dir(spark, root, glob="*.img").select(
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("checksum"),
    )
    rows = df.collect()
    assert len(rows) == 2
    assert all(len(r.checksum) == 32 for r in rows)


def test_multimodal_capstone_binary_to_topk(spark, tmp_path):
    """Capstone: raw asset directory → binaryFile scan → (stub) decode
    features → (stub) embedding → cosine top-k — the full multimodal
    retrieval pipeline with every Spark-side seam real (schemas, Arrow
    batching, broadcast scoring) and only the codec/encoder stubbed
    (no PIL/torch in this container)."""
    import numpy as np

    from eeg_data_lake_spark.functions.embed import with_text_embedding
    from eeg_data_lake_spark.workload.similarity import as_double, dot, l2norm

    root = str(tmp_path / "assets")
    os.makedirs(root)
    for i in range(8):
        with open(os.path.join(root, f"doc_{i}.img"), "wb") as fh:
            fh.write((f"asset {i} " * (i + 3)).encode())

    assets = read_binary_dir(spark, root, glob="*.img").select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.img", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").cast("string").alias("text"),  # stub decode
    )
    emb = with_text_embedding(assets).select(
        "doc_id", as_double(F.col("embedding")).alias("e")
    )
    q = emb.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = emb.join(
        F.broadcast(q), F.col("doc_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        (dot(F.col("qe"), F.col("e")) / (l2norm(F.col("qe")) * l2norm(F.col("e"))))
        .alias("cosine"),
    )
    rows = scored.collect()
    # every (query, neighbor) pair scored, none self-paired, all finite
    assert len(rows) == 2 * 7
    assert all(r.query_id != r.neighbor_id for r in rows)
    assert all(np.isfinite(r.cosine) and -1.001 <= r.cosine <= 1.001 for r in rows)
