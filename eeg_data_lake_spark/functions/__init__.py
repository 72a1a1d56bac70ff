"""Column/series-level function library (beyond pyspark.sql.functions).

signal: numpy-based digital filtering brought *inside* Spark as
Arrow-batched grouped-map UDFs (the reference runs this outside Spark
in a sequential pandas path — /root/reference/bronze-to-silver.py:71-91).
"""

from eeg_data_lake_spark.functions.signal import (  # noqa: F401
    bandpass_by_group,
    butter_bandpass,
    filtfilt,
    lfilter,
    standardize_by_group,
)
