"""eeg_data_lake_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of the EEG-Data-Lake reference (medallion lakehouse for
high-rate EEG time-series), extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale.

Layout:
  session     — SparkSession factory (local-first, scale-tuned confs)
  schemas     — canonical StructTypes (bronze/silver/gold + test tables)
  sources     — readers (text/CSV/parquet, lineage columns) and sinks
  operators   — relational / window / epoch / dedup / similarity / text
  functions   — column-expression helpers (vector math, signal DSP, json)
  pipeline    — medallion bronze → silver → gold (reference parity)
  streaming   — Structured Streaming ingest & windowed aggregation
  ml          — MLlib classification pipeline (reference train_model parity)
"""

from eeg_data_lake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
