from eeg_data_lake_spark.sources.readers import (
    read_channel_csv_lines,
    read_parquet_table,
    read_raw_csv_positional,
    read_testdata,
    read_wide_trial_csv,
)
from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.sources.writers import write_partitioned

__all__ = [
    "read_channel_csv_lines",
    "read_parquet_table",
    "read_raw_csv_positional",
    "read_testdata",
    "read_wide_trial_csv",
    "TxTable",
    "write_partitioned",
]
