"""Incremental streaming ExactSubstr ingestion: the online form of
batch z18/z19 (workload/curation.py), mirroring streaming/dedup.py's
MinHash-LSH ingest for the exact-substring family.

Documents arrive continuously; each micro-batch appends to a
transaction-logged corpus table AND folds its L-gram occurrence counts
into a companion gram-index table, exactly-once across driver
restarts. The removal pass (``exact_substring_removal``) then computes
the Lee et al. 2022 answer — delete every token inside a substring of
>= L tokens appearing more than once ANYWHERE in the corpus ingested
so far — against the incrementally-maintained index, and equals batch
z18 over the union of all batches (pinned in
tests/test_streaming_exactsubstr.py).

Why removal is a separate pass, not per-batch: duplication is a
GLOBAL property that arrives late — a gram seen once in batch 1 and
again in batch 9 makes batch 1's tokens removable only at batch 9, so
any eagerly-emitted per-batch removal would be wrong the moment a
later batch duplicates old text. The incremental piece of the
computation is exactly the expensive global piece — the corpus-wide
gram count, O(batch) new work per batch instead of an O(corpus)
recount — while the removal pass is the narrow per-doc tail (recompute
grams narrowly, probe the index, array-expression removal; no
token-level rows, same ``esd_remove`` the batch queries use).

Index state is BOUNDED by construction without any rewrite: the table
is append-only with counts saturating at 2 (duplicated means ">= 2" —
the 3rd..Nth occurrences are irrelevant), and a batch's counts are
anti-joined against the already-saturated gram set before appending,
so a gram ever contributes at most two rows: (first-seen, c=1|2) and
at most one (promoted-to-duplicated, c=1). Keys are xxhash64 grams
(the z19 scale mode): 8 bytes of state per gram, never the text.

Crash safety follows streaming/dedup.py's two-table discipline:
corpus append FIRST, gram-index append second, each under its own
batch-keyed txn_id. A crash between them replays the batch — the
corpus append no-ops on its txn id and the index append completes
with identical content (the saturated-set it anti-joins against
cannot have advanced, because index commits are strictly ordered by
batch and batch N's was the one that crashed). Until the replay the
index lags the corpus, which only makes the removal pass
under-remove — never over-remove — and the replay heals it.

Reference capability upgraded: the reference's batch idempotent
rewrite loop (/root/reference/bronze-to-silver.py:74-76) re-scans
everything per run; this maintains the global dedup state online.

At 100 TB: the per-batch index fold shuffles only the batch's
distinct hashed grams (map-side combined). The saturation probe is
ROW-LOCAL (duplicated == some row carries c=2 — see
``gram_index_table``), so the per-trigger work is filters plus
batch-vs-index anti/semi joins, never an index-wide groupBy/sum; with
a ``bucketize_gram_index`` projection (sources/indexproj.py) those
probes read the index base co-located — zero index-side exchange per
trigger, only the small post-projection tail shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.indexproj import (
    bucketize_index,
    compact_index,
    index_frames,
)
from eeg_data_lake_spark.sources.txlog import TxTable
from eeg_data_lake_spark.streaming.txpair import index_missing, paired_commit
from eeg_data_lake_spark.workload.curation import (
    ESD_DUP_THRESHOLD,
    esd_grams,
    esd_remove,
)


def gram_index_table(spark: SparkSession, table: TxTable) -> TxTable:
    """The corpus table's companion gram index: (g xxhash64-long,
    c int) rows whose per-gram sum saturates at 2. The removal pass
    probes THIS table, so its cost scales with distinct grams, never
    with corpus rows re-scanned.

    Saturation is also ROW-LOCAL: a gram is known-duplicated iff some
    row carries ``c == ESD_DUP_THRESHOLD`` (a first-seen row with
    c=2, or the c=2 promotion row appended when a once-seen gram
    recurs). The per-trigger probe therefore never aggregates the
    index — it filters and anti-joins, which co-locate against a
    bucketed projection — while the removal pass's sum(c) >= 2 stays
    correct under both the marker rows and any legacy (1)+(1) pair
    (which self-heals to (1)+(1)+(2) at most once on its next
    occurrence)."""
    return TxTable(spark, table.path + "_grams")


def bucketize_gram_index(
    table: TxTable, base: str, n_buckets: int = 32
) -> str:
    """Materialize the gram index as a catalog table bucketed+sorted
    on g (sources/indexproj.py). Pass the same ``base`` to the writer
    and every later batch's saturation/promotion probes read the index
    base co-located — bucket i vs bucket i, zero index-side exchange —
    plus only the small post-projection tail. Cadence: at compaction,
    when the index files get rewritten anyway."""
    return bucketize_index(
        gram_index_table(table.spark, table), base, ["g"], n_buckets
    )


def compact_gram_index(
    table: TxTable,
    base: str | None,
    n_buckets: int = 32,
    max_small_files: int = 8,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    vacuum_keep_versions: int | None = None,
    max_projection_files: int | None = None,
) -> str | None:
    """Post-ingest maintenance: policy-compact the gram index and,
    when compaction ran under a live ``base`` projection, re-bucketize
    it BEFORE any vacuum so the next trigger's probe keeps its
    zero-exchange co-location instead of silently degrading to the
    full read (sources/indexproj.compact_index). A ``small_file_bytes``
    cutoff below ``target_file_bytes`` lets bin-packed outputs
    graduate, bounding each fire's rewrite at the un-graduated tail
    (see compact_index's docstring; measured in
    probes/steady_state.py)."""
    return compact_index(
        gram_index_table(table.spark, table),
        base,
        ["g"],
        n_buckets=n_buckets,
        max_small_files=max_small_files,
        target_file_bytes=target_file_bytes,
        small_file_bytes=small_file_bytes,
        vacuum_keep_versions=vacuum_keep_versions,
        max_projection_files=max_projection_files,
    )


def _tokenized(df: DataFrame) -> DataFrame:
    return df.select("doc_id", F.split(F.col("text"), " ").alias("w"))


def _gram_counts(df: DataFrame) -> DataFrame:
    """Per-gram saturating occurrence counts (g, c<=2) of ``df``."""
    return (
        esd_grams(_tokenized(df), hashed=True)
        .groupBy("g")
        .agg(
            F.least(F.count("*"), F.lit(ESD_DUP_THRESHOLD))
            .cast("int")
            .alias("c")
        )
    )


def ingest_batch_writer(
    table: TxTable, sink_id: str, bucketed_base: str | None = None
):
    """foreachBatch function: append the raw batch to the corpus and
    fold its saturating gram counts into the index, exactly-once via
    the shared corpus-first/index-second discipline
    (streaming/txpair.py). ``bucketed_base`` names a
    ``bucketize_gram_index`` projection: the saturation and promotion
    probes then read the index base co-located (no index-side shuffle
    per trigger) plus the post-projection txlog tail — without it the
    probes still avoid any index-wide AGGREGATION (the row-local c=2
    marker), paying only the join shuffle."""

    # The row-local marker scheme derives "saturated" from PRESENCE
    # (a once-seen gram recurring is promoted straight to the marker),
    # which is exact only for the Lee et al. criterion of "more than
    # once" == 2. A different threshold needs running counts carried
    # in the sub-threshold rows (promote when c_prior + c_batch >= T,
    # same co-located join shape) — fail loudly rather than silently
    # over-remove if the shared constant is ever retuned.
    if ESD_DUP_THRESHOLD != 2:
        raise ValueError(
            "streaming ExactSubstr's row-local saturation markers "
            f"assume ESD_DUP_THRESHOLD == 2, got {ESD_DUP_THRESHOLD}; "
            "generalize the promotion join to carry running counts "
            "before retuning"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx = gram_index_table(spark, table)
        if index_missing(table, idx):
            # Corpus seeded outside the stream: without a backfill the
            # seeded text's grams are never counted and removal
            # under-removes forever. Gram counts are COUNT-semantics,
            # so the currently replaying batch's own rows must be
            # EXCLUDED from the seed (with the index absent, the only
            # sink rows possibly already in the corpus are this
            # batch's — index commits are strictly ordered behind
            # their corpus commits): the regular index leg below
            # counts them exactly once under its replayable txn id,
            # and counting them here too would double them into
            # false duplicates (over-removal).
            seed = table.read().join(
                batch_df.select("doc_id").distinct(), "doc_id", "left_anti"
            )
            idx.append(
                _gram_counts(seed), txn_id=f"{sink_id}:grams-backfill"
            )
        counts = _gram_counts(batch_df)
        frames = index_frames(idx, bucketed_base)
        if frames:
            # ONE left join + batch-sized agg per frame (was: an
            # anti-join AND a semi-join per frame, plus a distinct, a
            # union and a final anti-join — twice the probe stages for
            # the same answer). Each frame probe stays co-located when
            # bucketed, and every aggregation is over BATCH-sized rows
            # keyed by the join key (partitioning reused, no extra
            # exchange) — still NEVER an index-wide groupBy/sum.
            # Per gram the fold tracks: _sat (some index row carries
            # the c=2 saturation marker → drop), _seen (any index row
            # at all → promote to the marker). _seen counting c=2 rows
            # too is equivalent to the old c<2 semi-join: a gram with
            # a c=2 row is dropped via _sat before _seen is consulted.
            cur = counts.withColumn("_sat", F.lit(False)).withColumn(
                "_seen", F.lit(False)
            )
            for fr in frames:
                j = cur.join(
                    fr.select("g", F.col("c").alias("_ic")), "g", "left"
                )
                cur = j.groupBy("g").agg(
                    F.first("c").alias("c"),
                    (
                        F.first("_sat")
                        | F.max(
                            F.coalesce(
                                F.col("_ic") >= ESD_DUP_THRESHOLD,
                                F.lit(False),
                            )
                        )
                    ).alias("_sat"),
                    (
                        F.first("_seen") | F.max(F.col("_ic").isNotNull())
                    ).alias("_seen"),
                )
            delta = cur.filter(~F.col("_sat")).select(
                "g",
                F.when(
                    F.col("_seen"), F.lit(ESD_DUP_THRESHOLD)
                )
                .otherwise(F.col("c"))
                .cast("int")
                .alias("c"),
            )
        else:
            delta = counts
        # every derivation here reads only the batch and the index
        # frames captured above -> safe to overlap the two legs' data
        # writes (txpair's stage_concurrently contract)
        paired_commit(
            table, batch_df, idx, delta, sink_id, "grams", batch_id,
            stage_concurrently=True,
        )

    return process


def stream_exactsubstr_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    table: TxTable,
    checkpoint_path: str,
    sink_id: str,
    max_files_per_trigger: int = 1,
    bucketed_base: str | None = None,
    maintain: bool = False,
    vacuum_keep_versions: int | None = None,
) -> None:
    """Drain a file-source document stream into the corpus + gram
    index (AvailableNow: terminates when caught up; re-invocations
    resume from the checkpoint and replay-committed batches no-op).

    ``maintain`` runs the family's post-drain compaction cadence
    (sources/indexproj.compact_index): a stale projection refreshes
    at its LIVE bucket count before any vacuum
    (``vacuum_keep_versions``; None = never vacuum).
    """
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(
            ingest_batch_writer(table, sink_id, bucketed_base=bucketed_base)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if maintain:
        compact_gram_index(
            table,
            bucketed_base,
            vacuum_keep_versions=vacuum_keep_versions,
        )


def exact_substring_removal(table: TxTable) -> DataFrame:
    """The z18-shaped removal over everything ingested so far, using
    the incrementally-maintained gram index instead of a corpus-wide
    recount: dup set = index grams whose saturating count-sum >= 2;
    positions are recomputed narrowly per doc (hashed keys, z19 mode)
    and removal is the shared array-expression tail. Output schema ==
    z18's: (doc_id, n_tokens, n_kept, n_removed, kept_md5)."""
    idx = gram_index_table(table.spark, table)
    docs = _tokenized(table.read())
    dup = (
        idx.read()
        .groupBy("g")
        .agg(F.sum("c").alias("t"))
        .filter(F.col("t") >= ESD_DUP_THRESHOLD)
        .select("g")
    )
    dpos = (
        esd_grams(docs, hashed=True).join(dup, "g").select("doc_id", "p")
    )
    return esd_remove(docs, dpos)
