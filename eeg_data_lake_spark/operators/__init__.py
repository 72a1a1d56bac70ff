"""Composite operators Spark lacks as single primitives (SURVEY.md
§2.3 note): as-of join, binned/predicate range join. Each is a pure
composition of DataFrame ops — no RDDs, no Python hop — chosen for its
shuffle profile at scale."""

from eeg_data_lake_spark.operators.joins import asof_join, range_count_join  # noqa: F401
from eeg_data_lake_spark.operators.skew import salted_join  # noqa: F401,E402
from eeg_data_lake_spark.operators.graph import connected_components  # noqa: F401,E402
