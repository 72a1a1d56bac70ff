"""Verified query workload.

Every operator class from SURVEY.md §2 (plus the north-star
dedup/similarity/text/streaming extensions) is instantiated here as a
named query over the driver's test tables, paired with an ANSI-SQL
oracle that DuckDB can run on the same parquet files. The registry is
what `__spark_entry__.queries()` / `oracle_sql()` expose to the driver.

Import side effects register the entries.
"""

from eeg_data_lake_spark.workload.registry import REGISTRY, Entry, register  # noqa: F401
from eeg_data_lake_spark.workload import relational  # noqa: F401
from eeg_data_lake_spark.workload import windows  # noqa: F401
from eeg_data_lake_spark.workload import timeseries  # noqa: F401
from eeg_data_lake_spark.workload import text  # noqa: F401
from eeg_data_lake_spark.workload import dedup  # noqa: F401
from eeg_data_lake_spark.workload import similarity  # noqa: F401
from eeg_data_lake_spark.workload import streaming  # noqa: F401
from eeg_data_lake_spark.workload import signalproc  # noqa: F401
from eeg_data_lake_spark.workload import mlops  # noqa: F401
from eeg_data_lake_spark.workload import multimodal  # noqa: F401
from eeg_data_lake_spark.workload import joins_advanced  # noqa: F401
from eeg_data_lake_spark.workload import curation  # noqa: F401
from eeg_data_lake_spark.workload import stats  # noqa: F401
from eeg_data_lake_spark.workload import formats  # noqa: F401
from eeg_data_lake_spark.workload import analytics  # noqa: F401
from eeg_data_lake_spark.workload import tpch_shapes  # noqa: F401
