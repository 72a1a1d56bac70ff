"""Structured-Streaming ingest (net-new capability; the reference's
incremental pattern is a boto3 exists-check,
/root/reference/bronze-to-silver.py:49-54,74-76)."""

from eeg_data_lake_spark.streaming.ingest import (  # noqa: F401
    stream_bronze_from_lines,
)
from eeg_data_lake_spark.streaming.incremental import (  # noqa: F401,E402
    incremental_agg_writer,
    maintain_incremental_gold,
    merge_partial_aggregates,
)
from eeg_data_lake_spark.streaming.silver import (  # noqa: F401,E402
    stream_silver_from_bronze_dir,
)
