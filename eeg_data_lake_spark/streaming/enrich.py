"""Event-time dimension enrichment for streams: join each micro-batch
of facts to an SCD2 dimension (sources/scd.py) AS OF each fact's own
timestamp, landing exactly-once in a transaction-logged table.

Why per-batch, not a stream-static join: Spark's stream-static join
re-plans the static side per micro-batch anyway; doing it explicitly
in foreachBatch lets the dimension be a TxTable snapshot (fresh read
each batch → dimension changes committed between batches are picked
up, with the txlog's commit atomicity deciding exactly which version
a batch sees) and lets the output commit carry a txn-id for
exactly-once (streaming/txsink.py contract).

Semantics — the reason SCD2 exists: a LATE fact joins the dimension
version that was valid AT THE FACT'S EVENT TIME, not the current one.
The join condition is business-key equality plus half-open interval
containment (_valid_from <= ts < _valid_to); Catalyst hashes the
equality and applies the interval as a join filter, so this stays a
BroadcastHashJoin (dimensions are broadcast-sized by design — a huge
dimension would swap in a shuffle hash join, same condition).

Facts with no covering dimension version survive with NULL attributes
(left join): dropping facts silently is never the sink's call; route
them with operators/expectations.py if the pipeline wants quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable


def enrich_as_of(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """``facts`` left-joined to the SCD2 ``dim`` version valid at each
    fact's ``ts_col``. Dimension meta/key columns are dropped from the
    output; attribute columns keep their names."""
    dkeys = [F.col(k).alias(f"__d_{k}") for k in keys]
    meta = ["_valid_from", "_valid_to", "_is_current"]
    attrs = [c for c in dim.columns if c not in keys and c not in meta]
    d = dim.select(*dkeys, "_valid_from", "_valid_to", *attrs)
    cond = None
    for k in keys:
        eq = F.col(k).eqNullSafe(F.col(f"__d_{k}"))
        cond = eq if cond is None else (cond & eq)
    ts = F.col(ts_col)
    cond = (
        cond
        & (F.col("_valid_from") <= ts)
        & (F.col("_valid_to").isNull() | (ts < F.col("_valid_to")))
    )
    return facts.join(F.broadcast(d), cond, "left").drop(
        *[f"__d_{k}" for k in keys], "_valid_from", "_valid_to"
    )


def scd2_enrich_writer(
    dim_table: TxTable,
    out_table: TxTable,
    keys: list[str],
    ts_col: str,
    sink_id: str,
):
    """foreachBatch function: enrich each fact micro-batch against the
    dimension snapshot current at batch time, append exactly-once."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from eeg_data_lake_spark.streaming.txpair import contract_gate

        enriched = enrich_as_of(batch_df, dim_table.read(), keys, ts_col)
        # per-trigger schema contract (streaming/txpair.py): a drifted
        # fact OR dimension schema fails this trigger loudly instead
        # of landing an incompatible file
        fold = contract_gate(out_table, enriched)
        out_table.append(enriched, txn_id=f"{sink_id}:batch-{batch_id}")
        fold()

    return process


def stream_enrich_to_txtable(
    spark: SparkSession,
    source_dir: str,
    schema,
    dim_table: TxTable,
    out_table: TxTable,
    keys: list[str],
    ts_col: str,
    checkpoint_path: str,
    sink_id: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain a file-source fact stream through SCD2 enrichment into
    ``out_table`` with AvailableNow semantics."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(
            scd2_enrich_writer(dim_table, out_table, keys, ts_col, sink_id)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
