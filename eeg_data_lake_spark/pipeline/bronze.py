"""Bronze ingest: raw EEG CSVs → long-format sample table.

Semantics re-implemented (not copied) from the reference's two ingest
variants — text-scan (/root/reference/delta_bronze.py:33-83) and
positional-CSV (/root/reference/main/combine_files.py:39-83) — unified
on the canonical bronze schema (schemas.BRONZE_SCHEMA): v2 column names
plus v1 lineage columns.

Scale notes (100 TB posture):
- The whole transform is narrow (project/explode) until the single
  pre-write repartition, so it pipelines within one stage per file
  split; Catalyst fuses every projection below into one codegen stage.
- ``posexplode`` multiplies rows ~256-512× — maxPartitionBytes should
  be sized for the *post*-explode width, which is why the session
  default stays at 128 MB of raw CSV (≈ a few GB exploded, still fine
  for 8 GB executors with 2-4 cores each).
- sample_idx derives from posexplode position (deterministic), never
  from monotonically_increasing_id (read-order dependent; see the
  hazard noted in SURVEY.md §2.5 W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark import schemas
from eeg_data_lake_spark.sources.readers import (
    read_channel_csv_lines,
    read_wide_trial_csv,
)


def _filename_metadata(df: DataFrame) -> DataFrame:
    """Parse headset/synset/image_id/take/session from the source path
    (regex semantics of /root/reference/main/combine_files.py:46-53)."""
    rx = schemas.FILENAME_RX
    # Non-matching filenames yield '' from regexp_extract; nullif/try_cast
    # turn that into NULL metadata instead of an ANSI cast failure.
    return (
        df.withColumn(
            "headset", F.nullif(F.regexp_extract("source_file", rx, 1), F.lit(""))
        )
        .withColumn(
            "synset", F.nullif(F.regexp_extract("source_file", rx, 2), F.lit(""))
        )
        .withColumn("image_id", F.regexp_extract("source_file", rx, 3).try_cast("int"))
        .withColumn("take", F.regexp_extract("source_file", rx, 4).try_cast("int"))
        .withColumn("session", F.regexp_extract("source_file", rx, 5).try_cast("int"))
    )


def bronze_transform_from_lines(lines: DataFrame) -> DataFrame:
    """The line→bronze transform body, shared verbatim by the batch
    reader (bronze_from_lines) and the streaming ingest
    (streaming.ingest.stream_bronze_from_lines): split → head/tail →
    cast via transform HOF → posexplode → channel whitelist → null
    drop. All expressions are JVM-side builtins (F2-F7 in SURVEY.md
    §2.7); no Python UDF touches the hot path. Input needs columns
    (value, source_file, _ingest_ts, _ingest_date).
    """
    tokens = lines.withColumn("tokens", F.split(F.col("value"), ","))
    parsed = (
        tokens.withColumn("channel", F.col("tokens").getItem(0))
        .withColumn(
            "samples",
            # try_cast: non-numeric tokens become null (dropped below)
            # instead of failing the job under Spark 4's ANSI mode.
            F.transform(
                F.slice(F.col("tokens"), 2, F.size(F.col("tokens")) - 1),
                lambda x: x.try_cast("double"),
            ),
        )
        .drop("value", "tokens")
    )
    # filename metadata BEFORE the explode: Catalyst does not push
    # projections below Generate, so extracting after would run the
    # five regexes once per exploded SAMPLE (~256-512x per line)
    # instead of once per line. Measured ~1.05x end-to-end on a
    # 300-file fixture (short-path regexes are cheap next to the
    # explode itself) — strictly less work, identical output
    parsed = _filename_metadata(parsed)
    long = parsed.select(
        "source_file",
        *[c for c in parsed.columns if c not in (
            "source_file", "channel", "samples", "_ingest_ts", "_ingest_date"
        )],
        "channel",
        F.posexplode("samples").alias("sample_idx", "value"),
        "_ingest_ts",
        "_ingest_date",
    )
    long = long.withColumn(
        "time_sec", F.col("sample_idx") / F.lit(schemas.FS)
    )
    clean = long.filter(F.col("channel").isin(schemas.CHANNELS)).dropna(
        subset=["value"]
    )
    return clean.select([f.name for f in schemas.BRONZE_SCHEMA.fields])


def bronze_from_lines(spark: SparkSession, path: str) -> DataFrame:
    """Text-line batch ingest: each line is ``channel,v1,...,vN``."""
    return bronze_transform_from_lines(read_channel_csv_lines(spark, path))


def bronze_from_wide_csv(spark: SparkSession, path: str) -> DataFrame:
    """Pilot-format ingest: headered wide CSV (one double column per
    channel) → long rows, trial_id parsed from ``trial_<id>.csv``.

    The wide→long stack uses the melt-style ``stack`` expression
    (semantics of /root/reference/pilots/pilot_silver.py:71-80) but the
    per-file sample index comes from a row_number over an explicit
    within-file position derived *before* the stack, avoiding the
    reference's read-order-dependent monotonically_increasing_id
    (/root/reference/pilots/pilot_silver.py:61)."""
    wide = read_wide_trial_csv(spark, path)
    wide = wide.withColumn(
        "trial_id",
        F.regexp_extract("source_file", schemas.PILOT_TRIAL_RX, 1).try_cast("long"),
    )
    n = len(schemas.CHANNELS)
    stack_expr = "stack({}, {}) as (channel, value)".format(
        n, ", ".join(f"'{c}', {c}" for c in schemas.CHANNELS)
    )
    # Row position within the file: pilot CSVs are one row per timepoint,
    # so the CSV reader's per-file row order IS the sample order. The
    # reader pins single-split-per-file (see read_wide_trial_csv), which
    # makes the per-file monotonic id follow file offset even past
    # maxPartitionBytes; ranking it within source_file is then
    # deterministic.
    from pyspark.sql import Window as W

    wide = wide.withColumn("_pos", F.monotonically_increasing_id())
    w = W.partitionBy("source_file").orderBy("_pos")
    wide = wide.withColumn("sample_idx", (F.row_number().over(w) - 1).cast("int"))
    long = wide.selectExpr(
        "source_file", "trial_id", "sample_idx", stack_expr, "_ingest_ts", "_ingest_date"
    ).withColumn("time_sec", F.col("sample_idx") / F.lit(schemas.FS))
    return long
