"""Streaming bronze ingest: file-source ``readStream`` over the raw
CSV drop directory → the batch bronze transform (reused, not
re-implemented) → parquet sink with checkpointing, driven by
``Trigger.AvailableNow``.

This replaces the reference's hand-rolled idempotence (S15: boto3
head_object skip, /root/reference/bronze-to-silver.py:49-54) with
engine-level exactly-once: the file-source checkpoint records which
files are ingested, so re-running the job picks up only new drops —
and a crashed batch replays atomically instead of half-writing.

Scale notes: the transform is the identical narrow project/explode
chain as batch, so throughput scales with executors exactly like
batch; ``maxFilesPerTrigger`` bounds per-batch work for a live
continuous run, while AvailableNow drains the backlog in bounded
batches and exits (the "incremental batch" deployment mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eeg_data_lake_spark.pipeline.bronze import bronze_transform_from_lines


def _stream_lines(spark: SparkSession, path: str, max_files: int | None) -> DataFrame:
    reader = spark.readStream.schema(
        T.StructType([T.StructField("value", T.StringType(), True)])
    )
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    df = reader.text(path)
    # one definition of lineage semantics — the batch readers' helper
    from eeg_data_lake_spark.sources.readers import with_lineage

    return with_lineage(df)


def stream_bronze_from_lines(
    spark: SparkSession,
    src_path: str,
    sink_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    partition_by: tuple[str, ...] = ("synset",),
) -> None:
    """Drain all currently-available raw CSVs into the bronze parquet
    table exactly once, then return. Re-invoking after new files land
    ingests only the new ones (checkpoint-tracked).
    """
    lines = _stream_lines(spark, src_path, max_files_per_trigger)
    bronze = bronze_transform_from_lines(lines)
    writer = (
        bronze.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()
