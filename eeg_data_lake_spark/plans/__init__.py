"""Physical-plan inspection utilities (the `.explain` feedback loop,
made assertable so plan quality is a tested invariant, not a one-time
observation)."""

from eeg_data_lake_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    explain_cost,
    explain_string,
    has_cartesian_or_bnlj,
    join_strategies,
    print_cost,
    pushed_filters,
    read_schema_columns,
)
from eeg_data_lake_spark.plans.metrics import (  # noqa: F401
    measure_shuffle,
    shuffle_totals,
)
