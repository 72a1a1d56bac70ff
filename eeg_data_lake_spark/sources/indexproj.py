"""Bucketed projections for APPEND-ONLY txlog index tables: the
base+tail read that lets a streaming probe co-locate against its index
without shuffling the index every trigger.

The streaming ingest indices (SimHash blocks in streaming/simhash.py,
CDC chunk hashes in streaming/chunkdedup.py) grow by one append per
micro-batch and are probed by EVERY micro-batch. Reading them straight
from the txlog parquet makes each probe shuffle the whole index on the
join key — the term that grows with the CORPUS, not the batch, i.e.
the per-trigger cost that kills a 100 TB ingest. The fix is the same
one sources/chunkstore.py proved for the content store (bucketize —
measured 2.24x fewer probe shuffle records): materialize the index as
a catalog table bucketed+sorted on the probe key, so the probe's join
reads bucket i against bucket i with NO index-side exchange.

The wrinkle vs the chunk store: a strict current-version projection
would be stale after every single batch (each batch appends), forcing
a full rewrite per trigger — worse than the shuffle it saves. Because
these indices are APPEND-ONLY, the LSM-style base+tail read is exact
instead: rows(now) = projection rows (built at index version V) plus
the txlog tail appended after V (``TxTable.changes(since=V)``). The
probe then joins each part separately — the BIG base co-located with
zero exchange, the small tail (a few recent batches) shuffling only
itself — and the production cadence is re-bucketize when the tail has
grown past taste, i.e. at compaction, when the files get rewritten
anyway.

Safety: the tail comes from ``TxTable.changes``, which treats
compact/zorder as transparent (physical rewrites, no logical rows —
so compacting the index does NOT invalidate a projection) and RAISES
on overwrite/upsert commits, so a projection can never silently serve
an index whose logical content was rewritten under it. A projection
is otherwise never "stale": any version <= current is completed
exactly by its tail. One carve-out: compact()+vacuum() AFTER the
projection deletes the tail appends' original files, so the row-level
delta is unrecoverable even though the live content is readable —
``index_frames`` then degrades to the plain full read (correct, the
co-location saving returns at the next re-bucketize) instead of
erroring every trigger. ``compact_index`` is the cadence that keeps
that degraded window closed: it re-bucketizes between the compaction
and the vacuum, so the next trigger always probes a fresh projection.
"""

from __future__ import annotations

import re

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from eeg_data_lake_spark.sources.bucketed import write_bucketed
from eeg_data_lake_spark.sources.txlog import TxTable, maybe_compact


def bucketize_index(
    idx: TxTable,
    base: str,
    key_cols: Sequence[str],
    n_buckets: int = 32,
) -> str:
    """Materialize ``idx``'s CURRENT rows as a catalog table bucketed
    (and sorted) on ``key_cols``, named ``{base}_v{N}`` for index
    version N; superseded projections of the same base are dropped.
    ``base`` must be a lowercase SQL identifier. Returns the table
    name. Pays one shuffle of the index NOW so that every subsequent
    probe pays none for the base."""
    version = idx.version()
    if version < 0:
        raise ValueError("nothing to bucketize: empty index")
    name = f"{base}_v{version}"
    # n_buckets should equal spark.sql.shuffle.partitions: Spark only
    # elides the bucketed side's exchange when the probe side's
    # shuffle lands on the same partition count — with a mismatch,
    # EnsureRequirements re-shuffles the PROJECTION side and the
    # co-location is silently lost (measured: the chunk-probe study
    # showed zero saving at 4 buckets vs 32 shuffle partitions, 3.9x
    # fewer probe shuffle records once aligned).
    # pin the snapshot to the version the name advertises: version()
    # and read() are two separate log replays, and a concurrent append
    # landing between them would leave a _v{N} projection physically
    # containing N+1's rows — which the tail (changes since N) then
    # serves AGAIN; exact for today's set-semantics consumers but a
    # double-count for any future count/sum consumer
    write_bucketed(
        idx.read(version=version), name, list(key_cols), n_buckets
    )
    spark = idx.spark
    for tbl in spark.catalog.listTables():
        if tbl.name != name and re.fullmatch(
            rf"{re.escape(base)}_v\d+", tbl.name
        ):
            spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
    return name


def projection_buckets(spark: SparkSession, name: str) -> int | None:
    """The catalog bucket count of projection table ``name`` (None if
    it cannot be determined). A refresh MUST reuse the live spec: the
    bucket count was chosen to match spark.sql.shuffle.partitions, and
    re-bucketizing at some caller default silently loses co-location
    (EnsureRequirements re-shuffles the projection side on any
    mismatch — the measured zero-saving failure mode)."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {name}")
            .filter("col_name = 'Num Buckets'")
            .collect()
        )
        return int(rows[0][1]) if rows else None
    except (AnalysisException, IndexError, ValueError):
        return None


def _rewritten_after(idx: TxTable, version: int) -> bool:
    """Whether any REWRITE commit — physical (compact/zorder, which
    a later vacuum turns into a stranded tail) or logical (overwrite/
    upsert/restore/delete/update, which invalidate the projection
    outright: ``changes`` refuses to cross them, so ``index_frames``
    raises on every probe) — landed after ``version``. Either way the
    maintenance hook must repair the projection; for logical rewrites
    ``extend_projection`` declines and the repair is the full
    re-bucketize from live content. Manifest-tail scan: only commits
    AFTER the projection's version are opened."""
    import json

    from eeg_data_lake_spark.sources.txlog import (
        LOGICAL_REWRITE_OPS,
        REWRITE_TRANSPARENT_OPS,
        iter_manifests,
    )

    repair_ops = REWRITE_TRANSPARENT_OPS | LOGICAL_REWRITE_OPS
    for v, mp in iter_manifests(idx.path):
        if v <= version:
            continue
        with open(mp) as fh:
            if json.load(fh).get("op") in repair_ops:
                return True
    return False


#: Table property set while a delta-extend is in flight; a projection
#: still carrying it was left by a crashed extend (physical rows past
#: its advertised version) and must be repaired by full re-bucketize,
#: never extended again (a second blind append would duplicate rows).
PENDING_EXTEND_PROP = "eeg.pending_extend"


def extend_projection(
    idx: TxTable,
    base: str,
    key_cols: Sequence[str],
    max_projection_files: int | None = None,
) -> str | None:
    """Tail-bounded projection refresh: APPEND the txlog tail (the
    appends landed after the live projection's version) into the
    existing bucketed table and rename it to ``{base}_v{current}`` —
    instead of re-bucketizing the whole index, which is the one
    index-∝ cost the steady-state probe left in the maintenance fire
    (probes/steady_state.py's "honest residual"). Because the index
    is append-only, projection(V) + appends(V..N] IS projection(N)
    exactly; the append lands as extra per-bucket files under the SAME
    bucket spec, so the probe's exchange elision — the corpus-∝ term —
    is untouched.

    The traded cost is per-file sortedness: Spark trusts sortBy
    metadata only for single-file buckets, so an extended projection's
    merge join re-inserts a partition-local sort until the next FULL
    re-bucketize restores one file per bucket. That graduation is the
    ``max_projection_files`` policy (default ``8 × bucket count``):
    when the table's file count would exceed it, this function
    declines and the caller falls back to ``bucketize_index`` — the
    same amortize-by-cadence shape txlog compaction itself uses.

    Crash-safe via ``PENDING_EXTEND_PROP``: set before the append,
    cleared after the rename. A crash in between leaves the property
    behind, and the next maintenance sees it and routes to the full
    rebuild (the physical table then holds the tail rows twice over
    the base+tail read — exact for the set-semantics dedup consumers,
    but not a state to extend further). Declines (returns None,
    caller re-bucketizes) when: no projection, pending marker set,
    bucket count undeterminable, file-count graduation, logical
    rewrite in the tail, vacuumed tail originals, or a schema-evolved
    tail the append cannot resolve."""
    spark = idx.spark
    proj = newest_projection(spark, base)
    if proj is None:
        return None
    name, v = proj
    version = idx.version()
    if version <= v:
        return name if version == v else None
    props = {
        r[0]: r[1]
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }
    if props.get(PENDING_EXTEND_PROP) == "1":
        return None
    live = projection_buckets(spark, name)
    if live is None:
        return None
    cap = (
        max_projection_files
        if max_projection_files is not None
        else 8 * live
    )
    if len(spark.table(name).inputFiles()) + live > cap:
        return None  # graduated: time for the full re-bucketize
    from eeg_data_lake_spark.sources.txlog import feed_adds_between

    try:
        adds = feed_adds_between(
            idx.path, v, version, False, f"extend_projection({base})"
        )
    except ValueError:
        # logical rewrite in the tail (projection invalid) or
        # vacuumed tail originals (delta unrecoverable): both need
        # the full rebuild from live content
        return None
    new_name = f"{base}_v{version}"
    if adds:
        tail = idx.changes(since=v, to=version).drop("_commit_version")
        spark.sql(
            f"ALTER TABLE {name} SET TBLPROPERTIES "
            f"('{PENDING_EXTEND_PROP}'='1')"
        )
        try:
            write_bucketed(tail, name, list(key_cols), live, mode="append")
        except Exception:
            # schema-evolved tail / writer refusal: nothing appended,
            # clear the marker and let the caller rebuild
            spark.sql(
                f"ALTER TABLE {name} UNSET TBLPROPERTIES "
                f"('{PENDING_EXTEND_PROP}')"
            )
            return None
    # rewrites-only tail (adds empty): pure rename — bumping the
    # advertised version past the rewrite commit is all a later
    # vacuum needs to never strand this projection
    spark.sql(f"DROP TABLE IF EXISTS {new_name}")
    # RENAME moves the warehouse dir, and — like saveAsTable — wedges
    # on an orphaned directory a previous session left at the target
    # name; same marker-gated reclaim as write_bucketed
    from eeg_data_lake_spark.sources.bucketed import (
        reclaim_orphan_location,
    )

    reclaim_orphan_location(spark, new_name)
    spark.sql(f"ALTER TABLE {name} RENAME TO {new_name}")
    spark.sql(
        f"ALTER TABLE {new_name} UNSET TBLPROPERTIES "
        f"('{PENDING_EXTEND_PROP}')"
    )
    return new_name


def compact_index(
    idx: TxTable,
    base: str | None,
    key_cols: Sequence[str],
    n_buckets: int = 32,
    max_small_files: int = 8,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    vacuum_keep_versions: int | None = None,
    max_projection_files: int | None = None,
) -> str | None:
    """The maintenance cadence the module docstring names ("re-
    bucketize at compaction"), as one call: policy-compact the index
    txlog (txlog.maybe_compact — no-op until more than
    ``max_small_files`` small files accumulate), and when ``base``'s
    live projection is STALE — a compact/zorder commit landed after
    its version, whether in this call or a previous one that crashed
    before re-projecting — re-bucketize it BEFORE any vacuum.
    Ordering is the point: compact()+vacuum() past a projection
    deletes the tail appends' original files and silently degrades
    ``index_frames`` to the co-location-free full read until someone
    remembers to re-project — this hook closes that window, so the
    very next trigger probes the fresh projection with zero index-side
    exchange (pinned in tests/test_indexproj.py). With
    ``vacuum_keep_versions`` set, vacuums afterwards (safe: the new
    projection has no tail to lose). Returns the refreshed projection
    name, or None when compaction didn't run or ``base`` has no
    projection to refresh.

    ``small_file_bytes`` decouples the qualify cutoff from the output
    target (txlog.compact's min_file_bytes): a cutoff BELOW the
    target lets bin-packed outputs GRADUATE — stop qualifying as
    small — so each fire rewrites only the un-graduated tail, never
    the whole index. That is the production amortization: at the
    default (cutoff == target) every file under the target re-
    qualifies forever and each fire at test scale is a full rewrite,
    which is what made compaction look corpus-proportional in the
    100x probes (measured either way in probes/steady_state.py).

    The projection refresh itself is tail-bounded too: the stale
    branch tries ``extend_projection`` (append the delta, rename)
    before falling back to the full ``bucketize_index`` — so BOTH
    legs of a fire now rewrite tail-, not index-, proportional bytes,
    with the full re-bucketize amortized behind the
    ``max_projection_files`` graduation cap (default 8 × the live
    bucket count)."""
    compacted = maybe_compact(
        idx,
        max_small_files=max_small_files,
        target_file_bytes=target_file_bytes,
        small_file_bytes=small_file_bytes,
    )
    refreshed = None
    if base is not None:
        proj = newest_projection(idx.spark, base)
        # staleness, not "compaction just ran", drives the refresh: a
        # crash between a previous call's compact and its re-bucketize
        # leaves a projection with physically rewritten history behind
        # it, and the NEXT maintenance call must repair that (its own
        # maybe_compact is a no-op then) — otherwise a later vacuum
        # strands the probe on the degraded full read, the exact
        # window this hook exists to close
        stale = proj is not None and _rewritten_after(idx, proj[1])
        if stale:
            # tail-bounded first: append only the delta and rename
            # (extend_projection) — the full re-bucketize below is the
            # graduation/repair path (file-count cap exceeded, crashed
            # extend, vacuumed tail, logical rewrite, schema
            # evolution), so the common fire pays tail-sized bytes,
            # not index-sized
            refreshed = extend_projection(
                idx, base, key_cols,
                max_projection_files=max_projection_files,
            )
        if stale and refreshed is None:
            # refresh at the LIVE projection's bucket count, not the
            # caller's default — the count encodes the shuffle-
            # partition alignment co-location depends on
            live = projection_buckets(idx.spark, proj[0])
            if live is None:
                # don't silently re-bucketize at a count that may
                # mismatch spark.sql.shuffle.partitions — that is the
                # zero-co-location failure mode this refresh exists to
                # prevent. Refresh anyway (a wrong-count projection
                # still beats a vacuumed-tail degraded read), loudly.
                import warnings

                warnings.warn(
                    f"compact_index: could not determine the live "
                    f"bucket count of projection {proj[0]!r}; "
                    f"refreshing at the caller default n_buckets="
                    f"{n_buckets}, which loses co-location if it "
                    f"mismatches spark.sql.shuffle.partitions",
                    stacklevel=2,
                )
            refreshed = bucketize_index(
                idx, base, key_cols, live or n_buckets
            )
    if vacuum_keep_versions is not None and (
        compacted is not None or refreshed is not None
    ):
        # vacuum only on triggers that actually changed physical
        # layout: a per-trigger unconditional vacuum would pay the
        # retention scan for nothing on quiet triggers, and — with a
        # stale projection still unrepaired — could delete the tail
        # originals the projection's base+tail read depends on. After
        # the refresh above the projection is current, so this vacuum
        # can no longer strand it.
        idx.vacuum(keep_versions=vacuum_keep_versions)
    return refreshed


def gc_projections(
    spark: SparkSession,
    prefix: str,
    keep_bases: Sequence[str] = (),
) -> list[str]:
    """Drop every projection catalog table named
    ``{prefix}<suffix>_v<N>`` whose base is not in ``keep_bases`` —
    the reclaim hook for query wrappers that mint a fresh
    per-invocation base (``z39m_<uuid>`` style): ``bucketize_index``
    drops only superseded VERSIONS of the same base, so without this
    every invocation (a bench loop, a parity sweep) leaves one live
    projection + warehouse directory behind forever.

    Provenance-gated like the orphan reclaim in sources/bucketed.py:
    a table is dropped only when its warehouse directory carries the
    ``MARKER_FILE`` our bucketed writer stamps (or the location
    cannot be resolved to a local path at all — then DROP TABLE is
    the only cleanup available and the catalog entry was created this
    session anyway). An unmarked local directory at a matching name
    is somebody else's data: skipped, with a warning. Returns the
    dropped table names."""
    import os
    import warnings
    from urllib.parse import urlparse

    from pyspark.errors import AnalysisException

    from eeg_data_lake_spark.sources.bucketed import MARKER_FILE

    pat = re.compile(rf"{re.escape(prefix)}[0-9a-z]+_v\d+")
    keep = {f"{b}_v" for b in keep_bases}
    dropped: list[str] = []
    for tbl in spark.catalog.listTables():
        if not pat.fullmatch(tbl.name):
            continue
        if any(tbl.name.startswith(k) for k in keep):
            continue
        loc_path: str | None = None
        try:
            loc = urlparse(
                spark.sql(f"DESCRIBE TABLE EXTENDED {tbl.name}")
                .filter("col_name = 'Location'")
                .collect()[0][1]
            )
            if loc.scheme in ("", "file"):
                loc_path = loc.path
        except (AnalysisException, IndexError):
            pass  # dropped-under-us / no Location row: fall through
        if loc_path is not None and os.path.isdir(loc_path) and not (
            os.path.exists(os.path.join(loc_path, MARKER_FILE))
        ):
            warnings.warn(
                f"gc_projections: {tbl.name!r} matches prefix "
                f"{prefix!r} but its directory carries no provenance "
                f"marker — skipping (not ours to drop)",
                stacklevel=2,
            )
            continue
        spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
        dropped.append(tbl.name)
    return dropped


def newest_projection(
    spark: SparkSession, base: str
) -> tuple[str, int] | None:
    """(table_name, index_version) of the newest ``{base}_v{N}``
    projection in the catalog, or None."""
    best: tuple[str, int] | None = None
    pat = re.compile(rf"{re.escape(base)}_v(\d+)")
    for tbl in spark.catalog.listTables():
        m = pat.fullmatch(tbl.name)
        if m and (best is None or int(m.group(1)) > best[1]):
            best = (tbl.name, int(m.group(1)))
    return best


def index_frames(idx: TxTable, base: str | None) -> list[DataFrame]:
    """The index's current rows as probe-ready frames.

    - no rows yet: ``[]`` (nothing to probe);
    - ``base`` is None or has no projection: ``[idx.read()]`` — the
      plain txlog path;
    - projection at version V: ``[bucketed base (merge-hinted — the
      base is the side that must never broadcast or re-shuffle at
      scale), txlog tail appended after V]``, tail omitted when empty.

    Callers run their probe join per frame and combine (anti-joins
    chain, hit-joins union): joining a UNION of the parts instead
    would discard the base's bucket partitioning and re-shuffle
    everything — the cost this module exists to remove."""
    if idx.version() < 0:
        return []
    if base is None:
        return [idx.read()]
    proj = newest_projection(idx.spark, base)
    if proj is None:
        return [idx.read()]
    name, v = proj
    frames = [idx.spark.table(name).hint("merge")]
    if idx.version() > v:
        try:
            frames.append(idx.changes(since=v).drop("_commit_version"))
        except ValueError as exc:
            if "vacuumed" not in str(exc):
                raise  # logical rewrite under the projection: unsafe
            # compact()+vacuum() after the projection deleted the
            # tail appends' ORIGINAL files, so the row-level delta is
            # gone even though the live content is fully readable —
            # fall back to the plain full read (correct, just not
            # co-located) instead of erroring every trigger until the
            # next re-bucketize
            return [idx.read()]
    return frames
