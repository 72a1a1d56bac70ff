"""ML layer (SURVEY.md §2.9 U5/U6): the reference's MLlib
classification pipeline and a distributed ridge regression."""

from eeg_data_lake_spark.ml.classify import train_classifier  # noqa: F401
from eeg_data_lake_spark.ml.ridge import ridge_fit, ridge_predict  # noqa: F401
from eeg_data_lake_spark.ml.lsh import (  # noqa: F401,E402
    brp_similarity_join,
    minhash_neardup_candidates,
)
