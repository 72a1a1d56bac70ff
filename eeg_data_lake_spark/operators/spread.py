"""Scale-adaptive input rebalance for expensive narrow stages.

The problem (optimization guide §2.5 "input skew", §6 "input split
size"): a scan whose file/row-group layout yields fewer partitions than
the cluster has task slots runs every NARROW operator above it — the
Python codec/chunker/encoder stages, the per-row gram/shingle
construction — at that reduced parallelism. Parquet splits at row-group
granularity, so a table written as one file with one row group is a
ONE-task scan no matter what ``spark.sql.files.maxPartitionBytes``
says; every core but one idles through the most CPU-expensive part of
the plan. That is exactly the shape of the local bench data (each
driver table is a single-row-group file), and the opposite of the
100 TB shape (millions of row groups, scan parallelism >> slots).

``spread`` fixes the local shape WITHOUT becoming a constant tuned for
it: it repartitions ONLY when the input's actual partition count falls
short of the session's task slots (``sparkContext.defaultParallelism``
— local[N] => N, a cluster => its total cores), and is a no-op the
moment the scan supplies enough splits on its own. At scale the gate
never fires and the plan is byte-identical to the un-spread one; the
exchange it adds locally carries the narrow projection the caller
passes in (ids, text — the proxy, never derived payloads), which is
the guide-§8 discipline of shuffling lightweight rows to place
expensive work.

Partitioning is HASH on the caller-named key columns (deterministic
under retries — guide §2.5 warns against rand()-derived keys; a
round-robin ``repartition(n)`` would also pay a local sort per task,
``spark.sql.execution.sortBeforeRepartition``) with enough distinct
keys to spread evenly, falling back to round-robin only when no key is
given. Results are unchanged by construction: every consumer here is
row-wise or key-grouped, and partitioning is not part of any query's
semantics.

``SPARK_GRAFT_SPREAD=off`` disables the rebalance globally (plan-shape
studies, cluster runs that want the scan's own layout verbatim).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fire only when the input has less than this fraction of the
#: session's task slots: a scan already supplying >= slots/2 partitions
#: keeps its layout (the exchange would buy little and cost a shuffle)
_MIN_FILL = 0.5


def spread(df: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Rebalance ``df`` to the session's task-slot count when (and only
    when) its current partitioning under-fills the cluster; identity
    otherwise. ``by`` names hash-partitioning key columns (deterministic
    under retry); without it the rebalance is round-robin.

    CALLER CONSTRAINT (round-10 ADVICE): pass a SCAN-LEVEL projection
    only — a narrow select straight off the source, never a frame with
    a shuffle/aggregation already above it. The partition-count probe
    (``df.rdd.getNumPartitions()``) forces physical planning, and under
    AQE that EXECUTES any upstream shuffle query stages at
    plan-construction time; those jobs' results are not reused by the
    later real action, so a post-shuffle input would silently pay its
    shuffle twice. Every call site in this package passes a bare scan
    projection; keep it that way (for a post-shuffle frame, size the
    shuffle itself instead — AQE advisory bytes or an explicit
    partition count)."""
    if os.environ.get("SPARK_GRAFT_SPREAD", "auto") == "off":
        return df
    try:
        if df.isStreaming:
            return df
        slots = df.sparkSession.sparkContext.defaultParallelism
        n_in = df.rdd.getNumPartitions()
    except Exception:  # plan not convertible / context gone: leave as-is
        return df
    if n_in >= max(int(slots * _MIN_FILL), 1):
        return df
    if by:
        return df.repartition(slots, *[F.col(c) for c in by])
    return df.repartition(slots)
