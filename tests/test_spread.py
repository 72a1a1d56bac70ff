"""The scale-adaptive input rebalance (operators/spread.py): gating
behavior and — the part that matters — result parity through the
spread path for the operator families that adopted it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eeg_data_lake_spark.operators.spread import spread


@pytest.fixture()
def one_part(spark):
    return spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word "), F.col("id").cast("string")).alias("text"),
    ).coalesce(1)


def test_spread_fires_on_underfilled_input(spark, one_part):
    slots = spark.sparkContext.defaultParallelism
    out = spread(one_part, by=["doc_id"])
    assert out.rdd.getNumPartitions() == slots


def test_spread_identity_when_enough_partitions(spark, one_part):
    slots = spark.sparkContext.defaultParallelism
    wide = one_part.repartition(slots * 2)
    assert spread(wide, by=["doc_id"]) is wide


def test_spread_identity_when_disabled(spark, one_part, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")
    assert spread(one_part, by=["doc_id"]) is one_part


def test_spread_preserves_rows(spark, one_part):
    a = sorted(one_part.collect())
    b = sorted(spread(one_part, by=["doc_id"]).collect())
    assert a == b


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunker_parity_through_spread(spark, sf_dir, monkeypatch):
    """chunk_rows emits the identical chunk set with the rebalance on
    and off (row-wise operator; partitioning is not semantics)."""
    from eeg_data_lake_spark.functions.chunking import chunk_rows
    from eeg_data_lake_spark.functions.multimodal import (
        attach_binary_payload,
    )

    blobs = attach_binary_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).select("doc_id", "payload")
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")
    plain = _rows(chunk_rows(blobs))
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "auto")
    assert _rows(chunk_rows(blobs)) == plain


def test_pcm_decode_parity_through_spread(spark, sf_dir, monkeypatch):
    from eeg_data_lake_spark.functions.multimodal import (
        attach_binary_payload,
        decode_pcm_features,
    )

    blobs = attach_binary_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")
    plain = _rows(decode_pcm_features(blobs))
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "auto")
    assert _rows(decode_pcm_features(blobs)) == plain


def test_text_embedding_parity_through_spread(spark, sf_dir, monkeypatch):
    """The encoder is deterministic per row (fixed-seed projection), so
    embeddings must be bit-equal regardless of partitioning."""
    from eeg_data_lake_spark.functions.embed import with_text_embedding

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")
    plain = _rows(with_text_embedding(docs).select("doc_id", "embedding"))
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "auto")
    assert (
        _rows(with_text_embedding(docs).select("doc_id", "embedding"))
        == plain
    )


def test_staged_batches_layout_and_order(spark, sf_dir):
    """_stage_key_batches (the one-pass staging rewrite): same slice
    membership as the old three filter+write jobs, deterministic
    key-sorted in-file order, one file per batch."""
    import os

    from eeg_data_lake_spark.workload.multimodal import _stage_key_batches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    _d, src = _stage_key_batches(docs, "spread_t_", "doc_id")
    files = sorted(os.listdir(src))
    assert files == ["batch_0.parquet", "batch_1.parquet", "batch_2.parquet"]
    for i in range(3):
        got = spark.read.parquet(os.path.join(src, f"batch_{i}.parquet"))
        assert got.columns == ["doc_id", "text"]
        ids = [r.doc_id for r in got.collect()]
        assert ids == sorted(ids)  # deterministic in-file order
        want = sorted(
            r.doc_id
            for r in docs.filter(F.col("doc_id") % 3 == i).collect()
        )
        assert ids == want
