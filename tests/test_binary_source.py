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
