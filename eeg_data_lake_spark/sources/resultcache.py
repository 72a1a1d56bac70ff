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

Every cached row carries BOTH a ``_cache_tag`` and a
``_source_version`` column, and reads filter on the pair — several
tagged queries can share one cache table without their rows bleeding
into each other. ``vacuum_cache(tag)`` only rewrites that tag's rows
(other tags' rows survive untouched) and records what it dropped in
its commit's txn_id, so the manifest-derived "is version v cached?"
check stays truthful after a vacuum instead of serving an empty
result for a version whose rows were reclaimed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eeg_data_lake_spark.sources.txlog import TxTable, iter_manifests
import json


def _check_tag(tag: str) -> str:
    """Tags must not contain '-': the txn-id grammar separates fields
    with dashes, and a tag like 'a-g7' would make legacy id
    'rc-a-g7-v3' (tag 'a-g7', version 3) indistinguishable from the
    current format's (tag 'a', generation 7, version 3) — a misclaim
    that would serve an empty result. Rejecting dashes at every entry
    point keeps both grammars unambiguous."""
    if not tag or "-" in tag:
        raise ValueError(
            f"cache tag {tag!r} must be non-empty and contain no '-' "
            "(the txn-id field separator)"
        )
    return tag


def _cache_state(cache: TxTable, tag: str) -> tuple[set[int], int, set[str]]:
    """``(valid_versions, n_vacuums, all_txn_ids)`` for ``tag``,
    replayed from the cache table's commit log in commit order: an
    ``rc-{tag}-g{g}-v{v}`` commit claims source version ``v`` cached;
    an ``rcvac-{tag}-n{k}-below-{floor}`` commit (legacy form without
    ``-n{k}``) drops every version claimed so far that is below its
    floor (a version RE-added after the vacuum stays valid — order
    matters). ``n_vacuums`` makes both re-add and vacuum txn ids
    unique: without the ``n{k}`` ordinal, two vacuums landing on the
    SAME floor (e.g. vacuum(keep_versions=0), recompute the sole
    version, vacuum(0) again) would share a txn id and the second
    overwrite would replay-skip — rows the caller asked to drop would
    survive. ``all_txn_ids`` is every txn id in the log (ours or not),
    used by writers to sidestep replay collisions with legacy ids."""
    claimed: set[int] = set()
    n_vac = 0
    txn_ids: set[str] = set()
    for _v, mp in iter_manifests(cache.path):
        with open(mp) as fh:
            tid = json.load(fh).get("txn_id") or ""
        if tid:
            txn_ids.add(tid)
        # Parse STRUCTURALLY from the right (rc-<tag>-g<int>-v<int> /
        # rcvac-<tag>[-n<int>]-below-<int>) and require the remaining
        # middle to equal the tag EXACTLY — a prefix test would
        # misattribute commits between tags where one tag is a prefix
        # of another (e.g. 'a' vs 'ag1' sharing a cache table). Tags
        # are dashless by _check_tag, so ids WE write are unambiguous.
        # A legacy id written for a DASHED tag ('rc-a-g7-v3' for old
        # tag 'a-g7') still parses as a claim for tag 'a' —
        # grammatically unavoidable; cached_result neutralizes it by
        # verifying the claimed slice is non-empty before serving and
        # bumping the generation past the collided id on recompute.
        if tid.startswith("rc-") and "-v" in tid and "-g" in tid:
            head, _, vpart = tid.rpartition("-v")
            mid, _, gpart = head.rpartition("-g")
            if mid == f"rc-{tag}" and vpart.isdigit() and gpart.isdigit():
                claimed.add(int(vpart))
        elif tid.startswith("rcvac-") and "-below-" in tid:
            mid, _, fpart = tid.rpartition("-below-")
            if fpart.isdigit():
                # current form carries a vacuum ordinal: rcvac-<tag>-n<k>
                nmid, _, npart = mid.rpartition("-n")
                is_vac = mid == f"rcvac-{tag}" or (
                    nmid == f"rcvac-{tag}" and npart.isdigit()
                )
                if is_vac:
                    n_vac += 1
                    floor = int(fpart)
                    claimed = {v for v in claimed if v >= floor}
    return claimed, n_vac, txn_ids


def cached_result(
    source: TxTable,
    cache: TxTable,
    compute: Callable[[DataFrame], DataFrame],
    tag: str,
) -> DataFrame:
    """The result of ``compute(source.read())`` at the source's CURRENT
    version — computed at most once per version, then served from
    ``cache``. ``tag`` namespaces several cached queries in one cache
    table (their schemas must match): rows are stored with the tag and
    reads filter on ``(tag, source_version)``."""
    _check_tag(tag)
    v = source.version()
    if v < 0:
        raise ValueError(f"source table at {source.path} has no data")
    cached, n_vac, txn_ids = _cache_state(cache, tag)

    # merge_schema: a cache table written before the _cache_tag column
    # existed holds files without it; the merged read surfaces those
    # rows with a NULL tag, so the tag filter excludes them (they are
    # unattributable to any tag and treated as not cached — the claim
    # parser likewise ignores legacy 'rc-{tag}-v{v}' txn ids) and the
    # query recomputes once under the current format instead of
    # AnalysisException-ing on a missing column.
    def read_slice() -> DataFrame:
        return (
            cache.read(merge_schema=True)
            .filter(
                (F.col("_cache_tag") == tag)
                & (F.col("_source_version") == v)
            )
            .drop("_cache_tag", "_source_version")
        )

    if v in cached:
        hit = read_slice()
        # trust-but-verify: a LEGACY txn id written for a dashed tag
        # (e.g. 'rc-a-g7-v3' for old tag 'a-g7') is grammatically
        # indistinguishable from a current-format claim for tag 'a',
        # but its rows never carry our tag — so a claim whose slice is
        # empty falls through to recompute instead of serving the
        # misclaimed empty result. Cost: a genuinely empty cached
        # result recomputes per call (the append below no-ops on its
        # txn id, so this stays correct and idempotent).
        if not hit.isEmpty():
            return hit
    result = (
        compute(source.read(version=v))
        .withColumn("_cache_tag", F.lit(tag))
        .withColumn("_source_version", F.lit(v).cast("long"))
        # persisted: the collision branch below runs isEmpty() (one
        # full compute) and then append() — uncached, the expensive
        # compute this module exists to avoid would run TWICE
        .persist()
    )
    txn = f"rc-{tag}-g{n_vac}-v{v}"
    if txn in txn_ids:
        # The id we'd commit under is already in the log but the slice
        # above was empty/absent. Two causes, handled differently:
        #  * a LEGIT earlier claim whose result is genuinely empty —
        #    the recompute is empty too; serve it WITHOUT a new commit
        #    so pathological empty results don't grow the log per call;
        #  * a LEGACY id written for an old dashed tag ('rc-a-g7-v3'
        #    for tag 'a-g7') that our append would replay-skip against,
        #    permanently serving an empty result — bump the generation
        #    past every committed id so the recompute actually LANDS.
        if result.isEmpty():
            result.unpersist()
            return result.drop("_cache_tag", "_source_version")
        g = n_vac + 1
        while f"rc-{tag}-g{g}-v{v}" in txn_ids:
            g += 1
        txn = f"rc-{tag}-g{g}-v{v}"
    try:
        cache.append(result, txn_id=txn)
    finally:
        result.unpersist()
    return read_slice()


def vacuum_cache(cache: TxTable, tag: str, keep_versions: int = 1) -> int:
    """Logically drop all but the newest ``keep_versions`` cached
    source versions for ``tag`` — other tags' rows are untouched (one
    overwrite commit; reclaim files with the table's normal vacuum).
    The commit's txn_id records the drop floor so later
    ``cached_result`` calls know the dropped versions are gone and
    recompute instead of serving an empty result. Returns the
    surviving row count for ``tag``."""
    versions, n_vac, txn_ids = _cache_state(cache, _check_tag(tag))
    versions = sorted(versions)
    if not versions:
        return 0
    keep = versions[-keep_versions:] if keep_versions else []
    # Everything strictly below this floor is dropped for this tag.
    floor = keep[0] if keep else versions[-1] + 1
    # merged read for pre-_cache_tag files (see cached_result); their
    # rows carry a NULL tag, fail both filter arms, and are reclaimed
    # by the first vacuum of any tag — they were unattributable dead
    # weight from the moment the tag column was introduced.
    survivors = cache.read(merge_schema=True).filter(
        (F.col("_cache_tag").isNotNull() & (F.col("_cache_tag") != tag))
        | (
            (F.col("_cache_tag") == tag)
            & F.col("_source_version").isin([int(k) for k in keep])
        )
    )
    # The vacuum ordinal makes REPEATED vacuums unique even when they
    # land on the same floor (drop-all, recompute the sole version,
    # drop-all again computes the same floor) — without it the second
    # overwrite would replay-skip and the rows the caller asked to
    # drop would silently survive. The while-loop additionally skips
    # past any colliding id a legacy log already contains.
    txn = f"rcvac-{tag}-n{n_vac}-below-{floor}"
    k = n_vac
    while txn in txn_ids:
        k += 1
        txn = f"rcvac-{tag}-n{k}-below-{floor}"
    cache.overwrite(survivors, txn_id=txn)
    # merged read for the count too: if legacy pre-_cache_tag files
    # are still live (nothing guarantees this vacuum was the first),
    # a plain read() would raise on the missing _cache_tag column.
    return (
        cache.read(merge_schema=True)
        .filter(F.col("_cache_tag") == tag)
        .count()
    )
