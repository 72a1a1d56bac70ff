"""Version-keyed result cache: materialize an expensive query's
result ONCE per source-table version and serve every later call from
the cache until the source actually changes — the lakehouse
equivalent of a materialized view with staleness = 0 (the cache key
IS the transaction-log version, so there is no TTL guessing and no
stale read: a new commit changes the version, which misses the cache
and recomputes).

Exactly-once under concurrency/crashes for free: the cache append's
txn_id encodes the source version, so two racing refreshers commit
one result (the loser's append no-ops on the txn id) and a crash
between compute and commit just recomputes. Old versions' rows stay
until ``vacuum_cache`` — time-travel-style debugging of "what did the
dashboard show at v12" included.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable, iter_manifests
import json


def _cached_versions(cache: TxTable, tag: str) -> set[int]:
    out: set[int] = set()
    prefix = f"rc-{tag}-v"
    for _v, mp in iter_manifests(cache.path):
        with open(mp) as fh:
            tid = json.load(fh).get("txn_id") or ""
        if tid.startswith(prefix):
            out.add(int(tid[len(prefix):]))
    return out


def cached_result(
    source: TxTable,
    cache: TxTable,
    compute: Callable[[DataFrame], DataFrame],
    tag: str,
) -> DataFrame:
    """The result of ``compute(source.read())`` at the source's CURRENT
    version — computed at most once per version, then served from
    ``cache``. ``tag`` namespaces several cached queries in one cache
    table (their schemas must match)."""
    v = source.version()
    if v < 0:
        raise ValueError(f"source table at {source.path} has no data")
    if v not in _cached_versions(cache, tag):
        result = compute(source.read(version=v)).withColumn(
            "_source_version", F.lit(v).cast("long")
        )
        cache.append(result, txn_id=f"rc-{tag}-v{v}")
    return (
        cache.read()
        .filter(F.col("_source_version") == v)
        .drop("_source_version")
    )


def vacuum_cache(cache: TxTable, tag: str, keep_versions: int = 1) -> int:
    """Logically drop all but the newest ``keep_versions`` cached
    source versions for ``tag`` (one overwrite commit; reclaim files
    with the table's normal vacuum). Returns surviving row count."""
    versions = sorted(_cached_versions(cache, tag))
    keep = set(versions[-keep_versions:]) if keep_versions else set()
    survivors = cache.read().filter(F.col("_source_version").isin(list(keep)))
    cache.overwrite(survivors)
    return survivors.count()
