"""Incremental gold maintenance: a streaming micro-batch pipeline that
keeps a keyed aggregate table up to date as data arrives, exactly-once.

The pattern (Delta calls it "streaming MERGE upsert", the classic name
is incremental view maintenance): each micro-batch is reduced to
per-key PARTIAL aggregates, merged with the current gold rows for the
touched keys, and upserted into the transaction-logged table with
txn_id = (sink_id, batch_id). A driver crash between the table commit
and the streaming checkpoint replays the batch; TxTable's txn-id
idempotence turns the replay into a no-op, so the aggregate is never
double-counted — the same (checkpoint x transactional sink) contract
as streaming/txsink.py, extended from append to stateful maintenance.

This works for any commutative-monoid aggregate (count, sum, min, max
— and avg/stddev via their sum-decompositions). The merge itself is
`touched-gold ∪ batch-partials → groupBy(keys).sum`, i.e. one shuffle
of (touched keys + batch keys), never of the whole history: cost per
batch is O(batch + touched), the property that makes incremental
maintenance worth it at 100 TB of history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable


def merge_partial_aggregates(
    table: TxTable,
    partial: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    txn_id: str | None = None,
) -> int:
    """Fold one batch of per-key partial sums into ``table``.

    ``partial`` must have exactly ``keys + sum_cols`` columns with one
    row per key; every ``sum_cols`` column must be merge-by-addition
    (counts are sums of 1). Returns the committed table version.
    """
    keys, sum_cols = list(keys), list(sum_cols)
    partial = partial.select(*keys, *sum_cols)
    try:
        current = table.read()
    except ValueError:  # first batch: nothing to merge with
        merged = partial
    else:
        touched = current.join(
            partial.select(*keys).distinct(), keys, "left_semi"
        )
        merged = (
            touched.unionByName(partial)
            .groupBy(*keys)
            .agg(*[F.sum(c).alias(c) for c in sum_cols])
        )
    return table.upsert(merged, keys, txn_id=txn_id)


def incremental_agg_writer(
    table: TxTable,
    sink_id: str,
    keys: Sequence[str],
    partial_agg,
    sum_cols: Sequence[str],
):
    """foreachBatch function maintaining ``table`` as the running
    ``partial_agg`` of everything streamed so far.

    ``partial_agg(batch_df) -> DataFrame`` reduces one micro-batch to
    per-key partials (keys + sum_cols). ``sink_id`` must be stable
    across restarts of the same logical stream.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        merge_partial_aggregates(
            table,
            partial_agg(batch_df),
            keys,
            sum_cols,
            txn_id=f"{sink_id}:batch-{batch_id}",
        )

    return process


def maintain_incremental_gold(
    spark: SparkSession,
    source_dir: str,
    schema,
    table: TxTable,
    checkpoint_path: str,
    sink_id: str,
    keys: Sequence[str],
    partial_agg,
    sum_cols: Sequence[str],
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain a file-source stream into an incrementally-maintained
    aggregate table (AvailableNow: terminates when caught up; restart
    with the same checkpoint to pick up new files)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(
            incremental_agg_writer(table, sink_id, keys, partial_agg, sum_cols)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def maintain_gold_from_changes(
    source: TxTable,
    gold: TxTable,
    keys: Sequence[str],
    partial_fn,
    since: int,
) -> int:
    """Batch-side incremental view maintenance driven by the source
    table's CHANGE FEED (TxTable.changes): fold only the rows appended
    since the consumer's last high-water mark into the gold aggregate,
    and return the new high-water mark to persist alongside it.

    This is the CDC-consumer pattern: downstream jobs never rescan the
    source — per run they read O(new rows), reduce them to per-key
    partials with ``partial_fn``, and merge via the same
    O(batch + touched-keys) upsert as the streaming path.

    Idempotence is PER SOURCE VERSION: each append commit folds into
    gold as its own upsert with txn_id ``cdc-<table>-v<version>``.
    A crash between the gold commit and persisting the high-water
    mark replays with a stale ``since``; every already-applied
    version no-ops on its txn id, and versions committed to the
    source meanwhile still apply — a single range-keyed txn id would
    either double-count the overlap (range grew) or drop the new
    versions (range reused).
    """
    from eeg_data_lake_spark.sources.txlog import feed_adds_between

    new_version = source.version()
    if new_version <= since:
        return since  # nothing new
    versions = [
        v
        for v, _files in feed_adds_between(
            source.path, since, new_version, False,
            f"maintain_gold_from_changes({since}, {new_version})",
        )
    ]
    for v in versions:
        delta = source.changes(since=v - 1, to=v).drop("_commit_version")
        partial = partial_fn(delta)
        sum_cols = [c for c in partial.columns if c not in keys]
        merge_partial_aggregates(
            gold,
            partial,
            keys,
            sum_cols,
            txn_id=f"cdc-{source.path}-v{v}",
        )
    return new_version
