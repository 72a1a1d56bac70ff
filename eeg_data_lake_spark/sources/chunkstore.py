"""Content-addressed chunk store: CDC-deduplicated blob STORAGE with
manifest-based reconstruction and reference-counted garbage collection.

z23 measures chunk-level redundancy and z24 ingests the chunk INDEX
online; this module is the third piece — the lifecycle half — where
the chunk store actually HOLDS the bytes and the corpus holds only
per-document manifests (ordered chunk-hash lists). That is the layout
content-addressed object stores (Git, restic/borg, Venti, commercial
backup dedup) converge on, here as two transaction-logged lake tables:

- ``chunks``  — one row per unique chunk ever stored:
  (chunk_md5, length, data). Append-only between GCs; a chunk's
  identity is its content hash, so rows are immutable.
- ``manifests`` — one row per LIVE document version:
  (doc_id, chunk_md5s array<string>, n_bytes). ``put`` MERGEs on
  doc_id, so re-putting a document supersedes its old manifest and the
  old version's no-longer-referenced chunks become garbage that
  ``gc()`` reclaims — deletion and version churn translate into
  storage reclaim, which plain z24 (index of hashes, corpus of full
  payloads) cannot express.

Crash-safety ordering (the inverse of z24's, deliberately): chunks
commit FIRST, manifests second, each under its own caller-keyed txn
id. A crash between them leaves orphan chunks — over-storage that gc()
reclaims — but never a manifest referencing bytes that were not yet
durable; replaying the put detects the already-committed chunk leg
(``has_txn``), skips the probe entirely (bucketed probes included —
the committed leg bumped the store version, so a pre-crash projection
would otherwise be refused as stale), and completes the manifest
MERGE. The reader-facing invariant is "a live manifest's
chunks always resolve", and ``reconstruct`` still surfaces violations
(e.g. a gc raced with a concurrent put) as ``missing_chunks > 0``
rather than silently returning truncated payloads.

At 100 TB: ``put`` is the narrow CDC chunker (per-row CPU, measured
flat at 10x for z23) plus one anti-join probing the store on the
16-byte hash — O(batch chunks) vs one row per unique chunk, never
stored bytes. That probe and the reconstruction join are the two
places the STORE side would shuffle, and ``bucketize()`` removes
both: it materializes the store as a catalog table bucketed+sorted on
chunk_md5 (sources/bucketed.py), and ``put(bucketed=...)`` /
``reconstruct(bucketed=...)`` then plan a sort-merge join whose
store-side scan has NO exchange and NO sort — only the (small) batch
/ manifest side moves (pinned in tests/test_chunkstore_bucketed.py).
The projection is versioned by store version and the readers REFUSE a
stale one (a stale probe would re-append known chunks; a stale
reconstruct would miss the newest), so the production cadence is
bucketize-after-compaction, exactly when a real store rewrites files
anyway. ``gc``'s referenced-set is an explode of manifest HASH arrays
(32 bytes per reference, never data) and its rewrite is the same
survivors-into-fresh-files shape as txlog OPTIMIZE; at scale restrict
the rewrite to store partitions whose dead-byte fraction clears a
threshold (the auto-compaction policy knob in sources/txlog.py).
``reconstruct`` shuffles each referenced chunk's bytes exactly once —
inherent: that IS the read amplification a content-addressed store
pays, and why hot blobs get a read-through cache in production.

Reference capability upgraded: the reference stores every file whole
and dedups by file md5 in a batch rewrite loop
(/root/reference/bronze-to-silver.py:74-76); this stores shared
regions once, survives edits (CDC resynchronization), reclaims space
on delete, and proves byte-identical reconstruction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeg_data_lake_spark.functions.chunking import chunk_rows
from eeg_data_lake_spark.sources.bucketed import write_bucketed
from eeg_data_lake_spark.sources.txlog import TxTable


def _stage_serially() -> bool:
    """Same env gate as txpair.chained_commit: =off forces the serial
    job order (A/B probes, one-in-flight-job deployments)."""
    import os

    return (
        os.environ.get("SPARK_GRAFT_STAGE_CONCURRENT", "auto") == "off"
    )


def storage_accounting(
    logical: DataFrame, physical: DataFrame
) -> DataFrame:
    """The shared one-row dedup-accounting report: a (n_docs,
    logical_bytes) aggregate × a (n_unique_chunks, stored_bytes)
    aggregate → columns + the dedup ratio. One definition serves both
    the batch store (``ChunkStore.storage_report``) and the streaming
    ingest (``streaming/chunkdedup.dedup_report``) so the ratio/guard
    semantics can't drift between them."""
    return logical.crossJoin(physical).select(
        "n_docs",
        "logical_bytes",
        "n_unique_chunks",
        "stored_bytes",
        F.round(
            F.col("logical_bytes")
            / F.greatest(F.col("stored_bytes"), F.lit(1)),
            4,
        ).alias("dedup_ratio"),
    )


class ChunkStore:
    """Two txlog tables under ``path``: ``<path>/chunks`` (content) and
    ``<path>/manifests`` (live document versions)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.chunks = TxTable(spark, f"{path}/chunks")
        self.manifests = TxTable(spark, f"{path}/manifests")

    # ---------------------------------------------------------- write

    def put(
        self,
        blobs: DataFrame,
        txn_id: str,
        id_col: str = "doc_id",
        payload_col: str = "payload",
        min_size: int = 64,
        avg_size: int = 256,
        max_size: int = 1024,
        bucketed: str | None = None,
    ) -> None:
        """Store a batch of (id, payload) blobs: novel chunk content
        appends to the store, manifests MERGE on id (re-put = new
        version). Ids must be unique within a batch — two versions of
        one document go in two puts. NULL payloads store as empty
        documents. Replaying the same ``txn_id`` is a no-op on both
        tables. ``bucketed`` names a ``bucketize()`` base: the known-
        chunk probe then reads the co-located projection (store-side
        scan shuffle-free) instead of the txlog parquet — it must be
        CURRENT (this put bumps the store version, so re-bucketize
        before the next bucketed put)."""
        rows = chunk_rows(
            blobs,
            id_col=id_col,
            payload_col=payload_col,
            min_size=min_size,
            avg_size=avg_size,
            max_size=max_size,
            with_data=True,
        ).persist()
        try:
            # Crash-replay: if the chunks leg already committed (the
            # crash hit between the two commits), skip the probe and
            # the no-op re-append entirely and just complete the
            # manifest MERGE. This is also what keeps bucketed puts
            # replayable — the committed leg bumped the store version,
            # so probing a projection snapshotted before the crash
            # would (correctly) be refused as stale.
            chunks_pending = not self.chunks.has_txn(f"{txn_id}:chunks")
            novel = None
            if chunks_pending:
                # one row per distinct chunk in the batch; any
                # occurrence's bytes serve (equal by content-hash
                # identity)
                batch_chunks = rows.groupBy("chunk_md5").agg(
                    F.min("length").alias("length"),
                    F.first("data").alias("data"),
                )
                known = self._known_hashes(bucketed)
                if known is not None:
                    novel = batch_chunks.join(
                        known, "chunk_md5", "left_anti"
                    )
                else:
                    novel = batch_chunks

            per_doc = rows.groupBy(id_col).agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_md5"))
                    ),
                    lambda x: x["chunk_md5"],
                ).alias("chunk_md5s"),
                F.sum("length").alias("n_bytes"),
            )
            # zero-chunk (empty/NULL payload) docs still get a manifest
            manifests = (
                blobs.select(F.col(id_col).alias("doc_id"))
                .distinct()
                .join(
                    per_doc.withColumnRenamed(id_col, "doc_id"),
                    "doc_id",
                    "left",
                )
                .select(
                    "doc_id",
                    F.coalesce(
                        "chunk_md5s", F.array().cast("array<string>")
                    ).alias("chunk_md5s"),
                    F.coalesce("n_bytes", F.lit(0)).cast("long").alias(
                        "n_bytes"
                    ),
                )
            )
            if chunks_pending:
                # The two legs' DATA-WRITE jobs run concurrently
                # (guide §2.6): the store's crash invariant — a live
                # manifest's chunks always resolve — binds the COMMIT
                # order (chunks manifest first, below), not the order
                # the data files hit disk; staged files are invisible
                # orphans until their commit_staged. Both legs consume
                # the persisted `rows`, so the chunker itself runs
                # once (block-level cache locks serialize first
                # computation) and the legs overlap their own agg +
                # write work. Measured (probes/txn_anatomy.py):
                # put = 1.9 s of which the two write jobs are 1.77 s
                # run back-to-back — overlap reclaims the smaller leg.
                # SPARK_GRAFT_STAGE_CONCURRENT=off forces the serial
                # staging order (A/B probes; same gate as txpair).
                if _stage_serially():
                    chunks_staged = self.chunks.stage(
                        novel.select("chunk_md5", "length", "data")
                    )
                    man_staged = self.manifests.stage_upsert(
                        manifests, ["doc_id"]
                    )
                else:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=2) as pool:
                        f_chunks = pool.submit(
                            self.chunks.stage,
                            novel.select("chunk_md5", "length", "data"),
                        )
                        f_man = pool.submit(
                            self.manifests.stage_upsert,
                            manifests,
                            ["doc_id"],
                        )
                        chunks_staged = f_chunks.result()
                        man_staged = f_man.result()
                self.chunks.commit_staged(
                    chunks_staged, txn_id=f"{txn_id}:chunks"
                )
                self.manifests.commit_staged(
                    man_staged, txn_id=f"{txn_id}:manifests"
                )
            else:
                self.manifests.upsert(
                    manifests, ["doc_id"], txn_id=f"{txn_id}:manifests"
                )
        finally:
            rows.unpersist()

    # ------------------------------------------------- bucketed index

    def _deduped_chunks(self) -> DataFrame:
        """One row per chunk_md5 even if the store physically holds
        more. txlog's documented optimistic concurrency lets two
        concurrent put() calls both append the same novel chunk (each
        probed a snapshot that lacked it); a duplicated store row must
        degrade to OVER-STORAGE only, never into reconstruct's
        resolution join fanning out and concatenating that chunk's
        bytes twice into every referencing payload with
        missing_chunks=0 (silent corruption). Rows with equal
        chunk_md5 are equal by content-hash identity, so any
        occurrence serves; gc() heals the physical duplication."""
        return self.chunks.read().groupBy("chunk_md5").agg(
            F.min("length").alias("length"),
            F.first("data").alias("data"),
        )

    def bucketize(self, base: str, n_buckets: int = 32) -> str:
        """Materialize the store's CURRENT version as a catalog table
        bucketed (and sorted) on chunk_md5 — the read-optimized
        projection: joins against it read bucket i vs bucket i with no
        store-side exchange or sort. The table name carries the store
        version (``{base}_v{N}``) so readers can detect staleness
        structurally; superseded projections of the same base are
        dropped. ``base`` must be a lowercase SQL identifier. Returns
        the versioned table name. At scale this is the compaction-time
        rewrite (txlog OPTIMIZE with a bucket spec): the store's files
        get rewritten anyway, so the bucket shuffle is paid once where
        a rewrite was already due."""
        import re

        version = self.chunks.version()
        if version < 0:
            raise ValueError("nothing to bucketize: empty store")
        name = f"{base}_v{version}"
        # deduped at projection-build time so the co-located joins stay
        # fan-out-free WITHOUT re-aggregating per query (which would
        # cost the bucketed reader its exchange-free plan)
        write_bucketed(
            self._deduped_chunks().select("chunk_md5", "length", "data"),
            name,
            ["chunk_md5"],
            n_buckets,
        )
        for tbl in self.spark.catalog.listTables():
            if (
                tbl.name != name
                and re.fullmatch(rf"{re.escape(base)}_v\d+", tbl.name)
            ):
                self.spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
        return name

    def _bucketed_store(self, base: str) -> DataFrame:
        """The projection for the store's CURRENT version, merge-hinted
        (the store is the big side at scale — it must sort-merge from
        its buckets, never broadcast). Raises if the projection is
        missing or stale: a stale probe would re-append known chunks
        and a stale reconstruct would miss the newest writes."""
        name = f"{base}_v{self.chunks.version()}"
        if not self.spark.catalog.tableExists(name):
            raise ValueError(
                f"bucketed projection {name!r} missing or stale — call "
                f"bucketize({base!r}) after every store write/gc"
            )
        return self.spark.table(name).hint("merge")

    def _known_hashes(self, bucketed: str | None) -> DataFrame | None:
        """Store-side relation for put's novel-chunk probe (None for an
        empty store: everything in the first batch is novel)."""
        if bucketed is not None:
            return self._bucketed_store(bucketed).select("chunk_md5")
        if self.chunks.version() >= 0:
            return self.chunks.read().select("chunk_md5")
        return None

    def delete_docs(self, predicate, txn_id: str) -> None:
        """Drop the manifests matching ``predicate`` (a Column over the
        manifest schema). Chunk content is NOT touched — that is
        ``gc()``'s job, so deletes stay cheap and time travel keeps
        working until the space is actually needed. NULL-valued
        predicates count as non-matching (the row SURVIVES): a bare
        ``~predicate`` would silently delete every row the predicate
        can't decide, the classic three-valued-logic inversion."""
        keep = ~F.coalesce(predicate, F.lit(False))
        self.manifests.overwrite(
            self.manifests.read().filter(keep), txn_id=txn_id
        )

    def gc(self, txn_id: str) -> DataFrame:
        """Reclaim chunks no live manifest references. Returns the
        one-row reclaim report (chunks/bytes before, dropped,
        after). The referenced-set is hashes only; the rewrite is the
        txlog survivors-into-fresh-files overwrite, conflict-checked
        against concurrent commits.

        The stats pass over the store touches only (chunk_md5, length)
        — 24-byte rows, no payload bytes on the wire, ONE job for both
        the before- and after-stat pairs — and the rewrite pass is the
        overwrite, which must move the surviving bytes regardless.
        Caching the store to share one pass (the small-data instinct)
        would pin the entire content store in executor memory at
        100 TB.

        Deliberately NOT ``df.observe()``/``Observation`` (which would
        fold the stat pairs into the rewrite's own action): in Spark
        4.1 ``classic.SparkSession.observationManager`` is a LAZY val
        of a non-serializable class — the first Observation in a
        session materializes it, after which ANY closure that captures
        the session fails task serialization (e.g. an MLlib model whose
        trainingSummary rides into its transform UDF:
        ``NotSerializableException: ObservationManager``). A
        session-global poisoning is not worth one metadata-only scan;
        pinned by tests/test_chunkstore.py::
        test_gc_does_not_poison_session_serialization."""
        referenced = self.manifests.read().select(
            F.explode("chunk_md5s").alias("chunk_md5")
        ).distinct()
        # before-stats count PHYSICAL rows (a concurrency-duplicated
        # chunk really is stored twice); after-stats count the DEDUPED
        # survivors the rewrite below materializes, so gc also heals
        # and accounts for duplicate store rows as reclaimed bytes.
        # BOTH stat pairs come from ONE metadata-only aggregation job:
        # group the (chunk_md5, length) pairs, flag each group as
        # referenced via a left join against the referenced set, then
        # roll physical counts (sum of group sizes / lengths) and live
        # counts (referenced groups, min length per group — exactly
        # what _deduped_chunks materializes) up in one pass.
        per_chunk = (
            self.chunks.read()
            .select("chunk_md5", "length")
            .groupBy("chunk_md5")
            .agg(
                F.count(F.lit(1)).alias("_rows"),
                F.sum("length").alias("_bytes"),
                F.min("length").alias("_minlen"),
            )
            .join(
                referenced.withColumn("_ref", F.lit(True)),
                "chunk_md5",
                "left",
            )
        )
        stats_df = per_chunk.agg(
            F.coalesce(F.sum("_rows"), F.lit(0)),
            F.coalesce(F.sum("_bytes"), F.lit(0)),
            F.count(F.when(F.col("_ref"), 1)),
            F.coalesce(F.sum(F.when(F.col("_ref"), F.col("_minlen"))), F.lit(0)),
        )
        live = self._deduped_chunks().join(
            referenced, "chunk_md5", "left_semi"
        )
        # The stats job and the rewrite are independent computations
        # over the SAME pre-gc snapshot (both plans resolved their
        # file lists at read() time above, and the overwrite only
        # marks old files removed — vacuum deletes them later), so run
        # them concurrently (guide §2.6) instead of back-to-back:
        # locally the stats job hides entirely under the rewrite wall;
        # at scale the metadata-only stats pass rides alongside the
        # byte-moving rewrite instead of extending it.
        if _stage_serially():
            n_all, b_all, n_live, b_live = stats_df.collect()[0]
            self.chunks.overwrite(
                live.select("chunk_md5", "length", "data"), txn_id=txn_id
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as pool:
                f_stats = pool.submit(lambda: stats_df.collect()[0])
                self.chunks.overwrite(
                    live.select("chunk_md5", "length", "data"),
                    txn_id=txn_id,
                )
                n_all, b_all, n_live, b_live = f_stats.result()
        return self.spark.createDataFrame(
            [
                (
                    int(n_all),
                    int(n_all - n_live),
                    int(b_all - b_live),
                    int(n_live),
                    int(b_live),
                )
            ],
            "chunks_before long, chunks_dropped long, bytes_reclaimed long,"
            " chunks_after long, stored_bytes long",
        )

    # ----------------------------------------------------------- read

    def reconstruct(
        self,
        doc_ids: DataFrame | None = None,
        bucketed: str | None = None,
    ) -> DataFrame:
        """Reassemble (doc_id, payload, n_bytes, missing_chunks) for
        every live document (or the ids in ``doc_ids``). Payloads are
        byte-identical to what was put — ordered manifest hashes join
        the store and concatenate. ``missing_chunks`` counts manifest
        references the store could not resolve (0 in a healthy store);
        such payloads are NULL, never silently truncated. ``bucketed``
        names a CURRENT ``bucketize()`` base: the chunk-resolution join
        then reads the co-located projection and only the exploded
        manifest side shuffles — the store's bytes stay where the
        bucket writer put them."""
        m = self.manifests.read()
        if doc_ids is not None:
            m = m.join(doc_ids.select("doc_id"), "doc_id", "left_semi")
        ex = m.select(
            "doc_id",
            "n_bytes",
            F.posexplode_outer("chunk_md5s").alias("pos", "chunk_md5"),
        )
        # the projection is deduped at bucketize() time (keeping the
        # co-located scan exchange-free); the txlog path dedupes here —
        # either way a concurrency-duplicated chunk row must not fan
        # the join out and concatenate its bytes twice (see
        # _deduped_chunks)
        store = (
            self._bucketed_store(bucketed)
            if bucketed is not None
            else self._deduped_chunks()
        )
        joined = ex.join(
            store.select("chunk_md5", "data"),
            "chunk_md5",
            "left",
        )
        parts = joined.groupBy("doc_id").agg(
            F.first("n_bytes").alias("n_bytes"),
            F.array_sort(
                F.collect_list(F.struct("pos", "data"))
            ).alias("parts"),
        )
        missing = F.size(
            F.filter(
                "parts", lambda x: x["pos"].isNotNull() & x["data"].isNull()
            )
        )
        return parts.select(
            "doc_id",
            F.when(
                missing > 0, F.lit(None).cast("binary")
            ).otherwise(
                F.aggregate(
                    "parts",
                    F.lit(b"").cast("binary"),
                    lambda acc, x: F.concat(
                        acc, F.coalesce(x["data"], F.lit(b"").cast("binary"))
                    ),
                )
            ).alias("payload"),
            "n_bytes",
            missing.alias("missing_chunks"),
        )

    def storage_report(self) -> DataFrame:
        """One-row accounting: live docs + logical bytes (manifests)
        vs unique chunks + stored bytes (store) and the dedup ratio."""
        logical = self.manifests.read().agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("n_bytes"), F.lit(0)).cast("long").alias(
                "logical_bytes"
            ),
        )
        # n_unique_chunks is distinct by hash; stored_bytes stays the
        # PHYSICAL sum — a concurrency-duplicated row genuinely costs
        # its bytes until gc() heals it, and the dedup ratio should
        # reflect what is actually stored.
        physical = self.chunks.read().agg(
            F.countDistinct("chunk_md5").alias("n_unique_chunks"),
            F.coalesce(F.sum("length"), F.lit(0)).cast("long").alias(
                "stored_bytes"
            ),
        )
        return storage_accounting(logical, physical)
