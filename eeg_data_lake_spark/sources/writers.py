"""Partitioned sinks (SURVEY.md §2.1 S8-S11).

Policy, not mechanism: the reference repartitions by the partition
columns immediately before every partitioned write
(/root/reference/delta_bronze.py:80, /root/reference/main/combine_files.py:78)
so each task writes few files. At 100 TB that exact pattern causes one
task per (partition-value) — a skew cliff when one synset/date dominates.
``write_partitioned`` therefore hash-distributes WITHIN partition values
when a target file count is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    files_per_partition: int = 1,
    fmt: str = "parquet",
) -> None:
    """Write a (possibly partitioned) table.

    files_per_partition > 1 salts the pre-write shuffle so a single hot
    partition value fans out to N writer tasks instead of one.
    """
    out = df
    if partition_by:
        if files_per_partition > 1:
            # pin the partition count: a by-number repartition is exempt
            # from AQE coalescing, which would otherwise merge the salted
            # shuffle back into few partitions and undo the fan-out
            # (byte-based coalescing can't see the writer-parallelism
            # intent, same failure mode as the pandas-UDF stages).
            par = df.sparkSession.sparkContext.defaultParallelism
            # DETERMINISTIC salt (row-content hash), never F.rand():
            # a retried map task re-evaluating rand() over re-fetched
            # input assigns rows to different salt buckets than the
            # reducers that already ran consumed — the SPARK-23207
            # silent duplicate/lost-row class. xxhash64 of the row
            # gives the same fan-out, stable under any retry order.
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.lit(files_per_partition),
            )
            out = df.repartition(
                max(par, files_per_partition),
                *[F.col(c) for c in partition_by],
                salt,
            )
        else:
            out = df.repartition(*partition_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "delta":  # pragma: no cover - needs delta-spark on classpath
        writer = writer.format("delta").option("overwriteSchema", "true")
        writer.save(path)
    else:
        writer.parquet(path)
