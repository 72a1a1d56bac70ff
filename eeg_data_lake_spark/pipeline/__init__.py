from eeg_data_lake_spark.pipeline.bronze import bronze_from_lines, bronze_from_wide_csv
from eeg_data_lake_spark.pipeline.silver import silver_bandpass, silver_from_bronze
from eeg_data_lake_spark.pipeline.gold import gold_epoch_features, gold_trial_channel

__all__ = [
    "bronze_from_lines",
    "bronze_from_wide_csv",
    "silver_from_bronze",
    "silver_bandpass",
    "gold_trial_channel",
    "gold_epoch_features",
]
