"""Skew-handling joins: salting for hot keys.

AQE's skew-join split (enabled in the session factory) handles most
skew by splitting oversized shuffle partitions, but it only helps
sort-merge joins and only after the skewed partition materializes.
Salting attacks the skew at the source: the hot side's key k becomes
(k, salt) with salt ∈ [0, S), and the other side is replicated S ways
so every (k, salt) bucket still finds its matches. One hot key's rows
now land on S reducers instead of one.

Cost model: replicating the build side S× is worth it iff the hot
key's share of rows ≫ 1/num_partitions — which is why this is an
explicit operator (applied to known-skewed joins, e.g. a boilerplate
synset or a celebrity user) rather than a default.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: join types for which salting preserves semantics. Right/full outer
#: would emit each unmatched row of the REPLICATED side once per salt
#: copy (salt_buckets null-extended duplicates), so they are rejected.
SALT_SAFE_JOINS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "semi", "left_anti", "leftanti", "anti"}
)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side
    with a uniform bucket, replicate ``other`` across all buckets, and
    join on (keys…, salt). Result equals ``skewed.join(other, on,
    how)`` row-for-row (asserted in tests) for inner/left-family joins
    ONLY — the unmatched-row side must be the salted one. For a
    right/full outer, swap the inputs and use the mirrored left join."""
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join supports inner/left-family joins, got {how!r}: "
            "unmatched rows of the replicated side would appear "
            f"{salt_buckets}x (once per salt copy)"
        )
    keys = list(on)
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=13) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = salted.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")


# --------------------------------------------- auto-routing policy
#
# The engine has had the three skew answers for rounds (plain shuffle,
# AQE runtime split, explicit salting) plus the r59 diagnosis that
# decides between them — but a user had to wire them together by hand.
# skew_aware_join applies the percentiles "auto" pattern: a cheap
# key-stats estimate routes the join, the decision is observable, and
# every route is row-identical to the plain join by construction.


#: hot-key factor, mirroring AQE's spark.sql.adaptive.skewJoin.
#: skewedPartitionFactor default (5): a key is "hot" when its rows
#: exceed factor x the average shuffle-partition's share of the fact.
#: Relative-only on purpose — at small data a false "salted" costs a
#: cheap replication, while an absolute floor would make the policy
#: untestable below cluster scale; production callers with a known
#: floor pass min_hot_rows.
SKEW_FACTOR = 5.0

#: memoized routing decisions keyed by (analyzed-plan semantic hash,
#: keys, factor, partitions) — same convention and staleness contract
#: as operators/percentiles._AUTO_CACHE (routing-only: every branch
#: is row-identical, so a stale entry costs balance, never results).
_SKEW_CACHE: dict[tuple, tuple[str, int | None]] = {}
_SKEW_CACHE_MAX = 256


@dataclass(frozen=True)
class SkewRoute:
    """One skew_aware_join call's routing record (``last_skew_route``)
    — the same observability contract as percentiles.PercentileRoute:
    a join that silently salted (or silently didn't) is a debugging
    trap at 100 TB.

    ``source``: ``forced`` (explicit strategy), ``streaming`` (lazy
    plain — an eager diagnostic would raise on a streaming frame),
    ``memo``, ``stats`` (catalog statistics proved the key near-
    unique, no job), or ``diagnostic`` (the r59-style per-key count
    action ran). ``strategy``: ``plain`` | ``salted`` | ``aqe``
    (skew detected but the join type is not salt-safe — the plain
    join is returned and AQE's runtime skew split is trusted).
    ``max_key_rows``/``n_rows`` are the diagnostic evidence (None
    when no action ran)."""

    source: str
    strategy: str
    max_key_rows: int | None = None
    n_rows: int | None = None
    salt_buckets: int | None = None


_LAST_SKEW_ROUTE: SkewRoute | None = None


def last_skew_route() -> SkewRoute | None:
    """The SkewRoute of the most recent ``skew_aware_join`` call in
    this process (None before the first call)."""
    return _LAST_SKEW_ROUTE


def _stats_unique_bound(df: DataFrame, keys: Sequence[str]) -> int | None:
    """An upper bound on the hottest key's row count, from catalog
    statistics with NO job — or None when stats can't prove one.

    With n rows and d distinct composite keys, the hottest key holds
    at most n - d + 1 rows; any single column's ndv is a lower bound
    on the composite d, so ``n - max_col_ndv + 1`` is a sound upper
    bound. Only tight when the key is near-unique (the common
    fact-side primary/foreign key case) — exactly the inputs where
    skipping the diagnostic scan matters; everything else falls
    through to the r59-style action. Same unscaled-plan guard as
    percentiles._stats_distinct_bound: under Filter/Join estimation
    the numbers stop being bounds."""
    from eeg_data_lake_spark.operators.percentiles import (
        _stats_plan_is_unscaled,
    )

    try:
        case_sensitive = (
            str(
                df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
            ).lower()
            == "true"
        )
        jplan = df._jdf.queryExecution().optimizedPlan()
        if not _stats_plan_is_unscaled(jplan):
            return None
        jstats = jplan.stats()
        rc = jstats.rowCount()
        if not rc.isDefined():
            return None
        n = int(str(rc.get()))
        want = {k if case_sensitive else k.lower() for k in keys}
        best_ndv: int | None = None
        it = jstats.attributeStats().iterator()
        while it.hasNext():
            kv = it.next()
            name = kv._1().name()
            if (name if case_sensitive else name.lower()) in want:
                dc = kv._2().distinctCount()
                if dc.isDefined():
                    ndv = int(str(dc.get()))
                    if best_ndv is None or ndv > best_ndv:
                        best_ndv = ndv
        if best_ndv is None:
            return None
        return max(n - best_ndv + 1, 1)
    except Exception:
        return None


def skew_aware_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    skew_factor: float = SKEW_FACTOR,
    salt_buckets: int | None = None,
    min_hot_rows: int = 0,
    strategy: str = "auto",
) -> DataFrame:
    """Equi-join that routes plain / salted / AQE-trusted from an
    r59-style key-stats estimate of ``skewed``'s join-key
    distribution — every route returns the same rows as
    ``skewed.join(other, on, how)`` (salting's row-equality is pinned
    in tests), so a wrong estimate costs balance, never correctness.

    The decision rule is AQE's own, applied at the source: the
    hottest key is oversized when its rows exceed ``skew_factor`` x
    the average shuffle-partition's share (``n_rows /
    spark.sql.shuffle.partitions``) — a key that big piles onto ONE
    reducer no matter how uniform the rest of the distribution is
    (five uniform event types on 32 reducers is still a 6x
    straggler). Routing sources, tried in order, percentiles-style:

    1. explicit ``strategy`` ("plain" / "salted") → forced, no
       estimate;
    2. streaming input → plain, decided lazily (an eager diagnostic
       would raise);
    3. the memo cache (analyzed-plan semantic hash);
    4. catalog statistics: when they prove the key near-unique
       (hot-key bound n - ndv + 1 under the threshold) the plain
       route needs NO job — at 100 TB this replaces a full key scan
       with a catalog lookup;
    5. the diagnostic action: one column-pruned groupBy(keys).count()
       + 1-row agg over the skewed side (|keys| rows shuffled).
       Callers feeding an expensive derived pipeline should persist
       it first, as with percentiles' pre-pass.

    A detected hot key routes SALTED (``salt_buckets`` defaults to
    the number of average-partition-sized chunks the hot key spans,
    capped at the session partition count) — salting fixes the skew
    before the shuffle exists, composes with any later stage, and is
    oracle-exact. For join types salting can't preserve (right/full
    outer), the plain join is returned and the route records ``aqe``:
    the session's AQE skew split (enabled in the session factory) is
    the runtime fallback for exactly those shapes. ``min_hot_rows``
    adds an absolute floor under which skew is ignored (0 = relative
    rule only; set it at cluster scale where a small hot key is
    cheaper than replication). The decision is observable via
    ``last_skew_route``."""
    global _LAST_SKEW_ROUTE
    keys = list(on)
    salt_safe = how.lower().replace("_", "") in {
        h.replace("_", "") for h in SALT_SAFE_JOINS
    }

    def plain() -> DataFrame:
        return skewed.join(other, keys, how)

    def finish(route: SkewRoute) -> DataFrame:
        global _LAST_SKEW_ROUTE
        _LAST_SKEW_ROUTE = route
        if route.strategy == "salted":
            return salted_join(
                skewed, other, keys, how, route.salt_buckets
            )
        return plain()

    if strategy != "auto":
        if strategy not in ("plain", "salted"):
            raise ValueError(
                f"skew_aware_join: strategy must be 'auto', 'plain' or "
                f"'salted', got {strategy!r}"
            )
        buckets = (salt_buckets or 8) if strategy == "salted" else None
        return finish(SkewRoute("forced", strategy, salt_buckets=buckets))
    if skewed.isStreaming:
        return finish(SkewRoute("streaming", "plain"))

    spark = skewed.sparkSession
    partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    from eeg_data_lake_spark.operators.percentiles import _plan_key

    pk = _plan_key(skewed)
    memo_key = (pk, tuple(keys), skew_factor, min_hot_rows, partitions)
    if pk is not None and memo_key in _SKEW_CACHE:
        strat, buckets = _SKEW_CACHE[memo_key]
        if strat == "salted" and not salt_safe:
            strat, buckets = "aqe", None
        return finish(SkewRoute("memo", strat, salt_buckets=buckets))

    source = "stats"
    max_n: int | None = None
    n_rows: int | None = None
    bound = _stats_unique_bound(skewed, keys)
    hot = None
    if bound is not None:
        # stats can only PROVE the absence of a hot key (the bound is
        # an upper estimate); proving presence needs the diagnostic
        try:
            jstats = skewed._jdf.queryExecution().optimizedPlan().stats()
            n_rows = int(str(jstats.rowCount().get()))
        except Exception:
            n_rows = None
        if n_rows and bound <= max(
            skew_factor * n_rows / partitions, float(min_hot_rows)
        ):
            hot = False
            max_n = bound
    if hot is None:
        source = "diagnostic"
        row = (
            skewed.select(*keys)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("_max"), F.sum("_n").alias("_tot"))
            .first()
        )
        max_n = row[0] or 0
        n_rows = row[1] or 0
        hot = n_rows > 0 and max_n > max(
            skew_factor * n_rows / partitions, float(min_hot_rows)
        )

    if not hot:
        strat, buckets = "plain", None
    else:
        # enough buckets to split the hot key into average-partition-
        # sized chunks, bounded by the reducer count (more buckets
        # than reducers buys nothing and replicates the build further)
        buckets = salt_buckets or max(
            2, min(-(-max_n * partitions // max(n_rows, 1)), partitions)
        )
        strat = "salted" if salt_safe else "aqe"
    if pk is not None:
        if len(_SKEW_CACHE) >= _SKEW_CACHE_MAX:
            _SKEW_CACHE.pop(next(iter(_SKEW_CACHE)))
        # the cache stores the salt-safe-independent decision
        # ("salted" downgrades to "aqe" at read time for join types
        # salting can't preserve), so one diagnostic serves both
        _SKEW_CACHE[memo_key] = (
            ("salted", buckets) if hot else ("plain", None)
        )
    return finish(
        SkewRoute(
            source,
            strat,
            max_n,
            n_rows,
            buckets if strat == "salted" else None,
        )
    )
