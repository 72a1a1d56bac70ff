"""Distributed exact percentiles via cumulative rank arithmetic.

Spark's exact ``percentile`` aggregate keeps a value→count map as
per-partition state and merges those maps into one reducer per group —
with few groups the merge is a serial bottleneck and the partial state
is as large as the distinct values (the reference's gold layer dodges
this with percentile_approx, main/gold.py:67-68, at the cost of
sketch-dependent results). This operator computes the *same* linearly
interpolated quantiles as ``percentile`` / ``quantile_cont`` with a
fully parallel plan:

1. ``groupBy(key, value).count()``      — the only heavy shuffle; map-side
   combine collapses duplicates, parallelism = shuffle partitions.
2. cumulative-count window per key      — runs on |distinct values| rows
   (not |rows|), one partition per key.
3. pick the two bracketing values per   — conditional aggregation, tiny.
   target rank and interpolate

At 100 TB the step-2 window sees only per-key distinct values; if even
that is too large, pre-bucketing values (floor(v/w)*w) bounds it with a
controllable error — the step-1 shuffle shape is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: per-key distinct values above which "auto" routes to the bucketed
#: cumulation. The measured crossover (BASELINE.md round 7): at 180k
#: distincts/key the single-task sort wins 1.75 s vs 3.21 s — the
#: boundary sketch + extra stages only pay off when one task's sort
#: stops fitting comfortably; ~4M (double, long) rows ≈ 100 MB of
#: single-task sort state is where that comfort ends. Partitioning-
#: only: both branches are bit-identical, so a wrong guess near the
#: threshold costs balance, never correctness.
AUTO_BUCKET_THRESHOLD = 4_000_000


#: memoized auto decisions keyed by (analyzed-plan semantic hash, key,
#: value, threshold): constructing the same percentile plan repeatedly
#: (a bench loop, a plan audit, a retry) pays the estimator action
#: once. Staleness is partitioning-only — data changing under an
#: identical plan can at worst route a borderline input to the other
#: (bit-identical) cumulation — and the cache is size-capped.
_AUTO_CACHE: dict[tuple, int | None] = {}
_AUTO_CACHE_MAX = 256


@dataclass(frozen=True)
class PercentileRoute:
    """The routing decision of one ``exact_percentiles`` call — the
    observability record task-7 style operators need at scale: an
    operator that silently chose the single-task window on a 100 TB
    input is a debugging trap, so every call records WHICH path
    decided (and on what evidence) where the caller can read it.

    ``source``: ``forced`` (explicit value_buckets), ``streaming``
    (lazy single-window — an eager estimate would raise on a
    streaming frame), ``memo`` (cached decision for this analyzed
    plan), ``stats`` (catalog statistics, no job), or ``prepass``
    (the HLL estimate action). ``bound`` is the per-key
    distinct-count evidence the decision used (None when no estimate
    ran). ``value_buckets`` is the decision itself: None =
    single-window cumulation, int = bucketed at that width."""

    source: str
    value_buckets: int | None
    bound: int | None = None


#: last call's routing record (read via ``last_route``). A plain
#: module-level cell, not df.observe(): attaching a CollectMetrics
#: node would change the returned plan (q10's plan pin reads it), and
#: the record must be readable BEFORE any action runs. Per-process
#: like the memo cache; concurrent driver threads see the most recent
#: writer, which is the standard trade for debug counters.
_LAST_ROUTE: PercentileRoute | None = None


def last_route() -> PercentileRoute | None:
    """The ``PercentileRoute`` of the most recent ``exact_percentiles``
    call in this process (None before the first call)."""
    return _LAST_ROUTE


def _plan_key(df: DataFrame) -> int | None:
    """Semantic hash of the analyzed plan, or None (→ no memoization)
    when the internal accessor drifts — the estimate then just runs."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return None


#: optimized-plan node classes through which catalog statistics pass
#: UNSCALED: a bare relation serves its ANALYZE numbers verbatim, a
#: Project neither filters rows nor rescales column stats. Anything
#: else (Filter, Join, Aggregate, Sample, ...) runs Catalyst's
#: ESTIMATION (FilterEstimation scales ndv/rowCount by estimated
#: selectivity), which can land BELOW the true count — no longer an
#: upper bound, so the fast path must bail to the HLL pre-pass.
_STATS_SAFE_NODES = frozenset(
    {"Project", "LogicalRelation", "HiveTableRelation", "SubqueryAlias"}
)


def _stats_plan_is_unscaled(jplan) -> bool:
    """True iff every node of the optimized plan is one through which
    catalog stats pass verbatim (see _STATS_SAFE_NODES)."""
    name = jplan.getClass().getSimpleName()
    if name not in _STATS_SAFE_NODES:
        return False
    it = jplan.children().iterator()
    while it.hasNext():
        if not _stats_plan_is_unscaled(it.next()):
            return False
    return True


def _stats_distinct_bound(df: DataFrame, value: str) -> tuple[int | None, bool]:
    """(bound, is_ndv): an UPPER bound on the largest per-key
    distinct-value count, read from the optimized plan's statistics
    WITHOUT running a job — the catalog-stats fast path of the "auto"
    policy. ``is_ndv`` tells the caller whether the bound came from
    the ``value`` column's distinct count (tight enough to ROUTE on)
    or only from rowCount (safe for the <= threshold short-circuit,
    too loose to justify skipping the HLL pre-pass beyond it). Two
    sources, the tighter wins:

    - the ``value`` column's ndv from ``ANALYZE TABLE ... COMPUTE
      STATISTICS FOR COLUMNS`` (per-key distincts can't exceed the
      global distinct count);
    - the plan's rowCount (distinct values can't exceed rows).

    The upper-bound claim only holds when the stats pass through the
    plan UNSCALED — bare scan / Project shapes. Under a Filter or
    Join, Catalyst's estimation multiplies ndv/rowCount by an
    estimated selectivity that can undershoot reality, so those plans
    return (None, False) and the caller runs the pre-pass. Stats
    propagate only under ``spark.sql.cbo.enabled`` (probed on this
    Spark version: planStats.enabled alone does not) and only for
    ANALYZEd catalog tables — a bare path read also yields None.
    py4j plan access is best-effort (None on any drift), mirroring
    ``_plan_key``. The name match follows the session's
    ``spark.sql.caseSensitive`` conf, like Spark's own column
    resolution (exact under case-sensitive sessions, else
    case-insensitive).

    Note the bound is only as exact as its source: catalog ndv from
    ANALYZE is itself an HLL approximation, so "upper bound" means
    upper bound on the ESTIMATE's error class — same class as the
    HLL pre-pass, minus the extra scan — not a hard count. Routing
    tolerance covers that (both branches are bit-identical)."""
    try:
        case_sensitive = (
            str(
                df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
            ).lower()
            == "true"
        )
        want = value if case_sensitive else value.lower()
        jplan = df._jdf.queryExecution().optimizedPlan()
        if not _stats_plan_is_unscaled(jplan):
            return None, False
        jstats = jplan.stats()
        bound: int | None = None
        is_ndv = False
        rc = jstats.rowCount()
        if rc.isDefined():
            # py4j may hand the scala BigInt back as a Python int or
            # as a JavaObject depending on magnitude; str() covers both
            bound = int(str(rc.get()))
        it = jstats.attributeStats().iterator()
        while it.hasNext():
            kv = it.next()
            got = kv._1().name()
            if (got if case_sensitive else got.lower()) == want:
                dc = kv._2().distinctCount()
                if dc.isDefined():
                    ndv = int(str(dc.get()))
                    if bound is None or ndv <= bound:
                        bound, is_ndv = ndv, True
                break
        return bound, is_ndv
    except Exception:
        return None, False


def _auto_value_buckets(
    df: DataFrame, key: str, value: str, threshold: int
) -> PercentileRoute:
    """The "auto" policy. Routing sources, tried in order:

    1. streaming input → single-window (None), decided lazily: an
       eager estimator action would raise AnalysisException on a
       streaming DataFrame (round-8 ADVICE guard).
    2. catalog statistics (``_stats_distinct_bound``), NO job, and
       only for plans where stats pass through UNSCALED (bare scan /
       Project — never under Filter/Join estimation): if the bound
       says distincts ≤ ``threshold``, single-window is right
       (approximately — catalog ndv from ANALYZE is itself an HLL
       estimate, the same error class as the pre-pass, minus the
       scan) regardless of which source produced it; beyond the
       threshold only the ``value`` column's own ndv routes bucketed
       (stats can't see the per-key split, so this can over-route a
       many-key input — costing only the boundary-sketch stages,
       never correctness), while a rowCount-only bound is too loose
       to route on and falls through to the pre-pass. At 100 TB the
       hit path replaces a full extra scan of the value column with
       a catalog lookup.
    3. the HLL pre-pass: estimate the largest per-key distinct count
       with one cheap action (column-pruned scan + partial HLL,
       |keys| rows shuffled). Because it is a separate action it
       RE-RUNS ``df``'s lineage: cheap when ``df`` is a
       (column-pruned) table read — the intended shape — but callers
       feeding an expensive derived pipeline should persist it first
       or pass an explicit ``value_buckets``.

    All sources are routing-only: both cumulation branches are
    bit-identical, so a stale or loose bound costs balance, never
    correctness. The estimate never materializes the heavy
    groupBy(key, value) shuffle, and the returned plan is
    byte-identical to the manually-selected form (q10's plan pin
    inspects the returned DataFrame only).

    Returns the full ``PercentileRoute`` (source + evidence +
    decision), not just the bucket count, so the caller can surface
    WHICH path decided — at 100 TB a silently-chosen single-task
    window is a debugging trap."""
    if df.isStreaming:
        return PercentileRoute("streaming", None)
    pk = _plan_key(df)
    memo_key = (pk, key, value, threshold)
    if pk is not None and memo_key in _AUTO_CACHE:
        return PercentileRoute("memo", _AUTO_CACHE[memo_key])
    decision: int | None = None
    bound, is_ndv = _stats_distinct_bound(df, value)
    if bound is not None and (bound <= threshold or is_ndv):
        # no job ran: <= threshold routes single-window (any source;
        # approximately — catalog ndv is an HLL estimate, same error
        # class as the pre-pass below); beyond it only the column's
        # own ndv is tight enough to route bucketed — a rowCount-only
        # bound above the threshold says nothing about distincts and
        # falls through
        est: int | None = bound
        source = "stats"
    else:
        est = (
            df.filter(F.col(value).isNotNull())
            .groupBy(key)
            .agg(F.approx_count_distinct(value).alias("_d"))
            .agg(F.max("_d"))
            .first()[0]
        )
        source = "prepass"
    if est is not None and est > threshold:
        decision = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    if pk is not None:
        if len(_AUTO_CACHE) >= _AUTO_CACHE_MAX:
            # FIFO-evict the oldest entry (insertion-ordered dict)
            # instead of dropping every warm entry at once
            _AUTO_CACHE.pop(next(iter(_AUTO_CACHE)))
        _AUTO_CACHE[memo_key] = decision
    return PercentileRoute(source, decision, est)


def _bucketed_cumulative(
    pc: DataFrame, key: str, value: str, n_buckets: int
) -> DataFrame:
    """``pc`` (key, value, _c — the UNFILTERED grouped relation,
    NULL-value rows included) + the same _lo/_hi/_n rank columns the
    per-key window computes, but with the heavy sort parallel over
    (key × value-range-bucket) instead of one task per key.

    Two-level cumulation: approximate global value quantiles split the
    value domain into ``n_buckets`` ranges (boundaries only steer
    PARTITIONING — a skewed split costs balance, never correctness);
    running sums are computed per (key, bucket) in parallel, and each
    bucket's starting offset comes from the tiny per-(key, bucket)
    totals relation (one window over |keys|·|buckets| rows). All
    arithmetic is the same integer count sums, so the result is
    bit-identical to the single-window form (equivalence pinned in
    tests/test_percentiles.py).

    NULL handling is the r10 fused-ranking argument generalized to the
    two levels (round-11, guide §2.4 — this is what let the caller's
    null-safe key-set left join be deleted): NULL values land in
    bucket 0 (the range test is never TRUE for NULL) and sort first
    there, contribute 0 to the local running sum, the bucket totals,
    and the offsets, and carry an empty (_lo == _hi) interval that can
    never bracket a target rank — so non-null ranks are untouched and
    an all-NULL (or NULL-key) group still surfaces its (key, NULL) row
    with _n = 0, exactly what the final groupBy needs to emit the
    builtin's NULL percentile."""
    # the boundary sketch is a SEPARATE action, and ReusedExchange
    # only dedupes within one plan — without materialization the
    # operator's heaviest stage (scan + groupBy(key, value) shuffle)
    # would run twice, once for ~B doubles and once for real. The
    # caller checkpoints the grouped relation, so the sketch and the
    # ranking read one materialization. (approxQuantile ignores NULL
    # values, so sketching the unfiltered relation is identical to
    # sketching the old filtered one.)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(pc.approxQuantile(value, qs, 0.01)))
    if not bounds:
        bounds = [0.0]
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    # NULL value: `b < NULL` is NULL for every boundary, filter keeps
    # none → bucket 0
    bucket = F.size(F.filter(barr, lambda b: b < F.col(value)))
    _nn = F.when(F.col(value).isNotNull(), F.col("_c")).otherwise(F.lit(0))
    b = pc.withColumn("_b", bucket)
    # asc ordering puts NULLs first within bucket 0 (their 0
    # contribution precedes every ranked row, like the single-window
    # form)
    w_local = Window.partitionBy(key, "_b").orderBy(value)
    local = b.withColumn("_lhi", F.sum(_nn).over(w_local))
    totals = b.groupBy(key, "_b").agg(F.sum(_nn).alias("_bt"))
    w_off = (
        Window.partitionBy(key)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        totals.withColumn("_off", F.coalesce(F.sum("_bt").over(w_off), F.lit(0)))
        .withColumn("_n", F.sum("_bt").over(Window.partitionBy(key)))
        .select(
            F.col(key).alias("__ok"),
            F.col("_b").alias("__ob"),
            "_off",
            "_n",
        )
    )
    return (
        local.join(
            F.broadcast(offsets),
            (F.col(key).eqNullSafe(F.col("__ok")))
            & (F.col("_b") == F.col("__ob")),
        )
        .withColumn("_hi", F.col("_off") + F.col("_lhi"))
        .withColumn("_lo", F.col("_hi") - _nn)
        .drop("__ok", "__ob", "_off", "_lhi", "_b")
    )


def exact_percentiles(
    df: DataFrame,
    key: str,
    value: str,
    ps: Sequence[float],
    prefix: str = "p",
    with_min_max: bool = False,
    value_buckets: int | None | str = "auto",
    auto_bucket_threshold: int = AUTO_BUCKET_THRESHOLD,
) -> DataFrame:
    """One row per ``key`` with one column per requested percentile
    (``p50`` for 0.5, ``p12_5`` for 0.125), matching
    ``percentile(value, p)``'s semantics: NULL values are ignored (not
    ranked) and quantiles use the same k = (n-1)·p linear
    interpolation on the same doubles.

    ``with_min_max`` adds ``vmin``/``vmax`` columns: min/max over the
    distinct-value relation equals min/max over the rows, so a caller
    that needs them alongside quantiles gets them for free off the
    SAME shuffle instead of paying a second scan of ``df``.

    ``value_buckets`` parallelizes the cumulative-rank stage over
    value-range buckets (``_bucketed_cumulative``): with FEW keys the
    per-key window otherwise runs one task per key — three reducers
    sorting a corpus of distinct values is the same narrow-stage
    shape this operator exists to avoid, one level up. Bit-identical
    results (integer count sums either way).

    The default ``"auto"`` selects the strategy from a cheap per-key
    distinct-count estimate (``_auto_value_buckets``): single-window
    until the largest key's distincts exceed ``auto_bucket_threshold``
    (~one comfortable task sort — see the measured crossover note on
    AUTO_BUCKET_THRESHOLD), bucketed at the session shuffle-partition
    count beyond it. When catalog column statistics cover the input
    (ANALYZEd table + plan-stats propagation) the decision is read
    from the catalog with NO extra job; a streaming input always
    routes single-window, lazily. Pass ``None`` to force
    single-window or an int to force a bucket count — the estimate
    pre-pass is then skipped entirely.

    Auto decisions are memoized per analyzed plan (semantic hash): if
    the underlying table is rewritten in place between calls, the
    cached routing can be stale until the entry is FIFO-evicted —
    stale routing affects PARTITIONING only (both branches are
    bit-identical), never results."""
    if not ps:
        raise ValueError("exact_percentiles: ps must name at least one percentile")
    if any(p < 0.0 or p > 1.0 for p in ps):
        raise ValueError(f"exact_percentiles: percentiles must be in [0, 1], got {ps}")
    # builtin percentile ignores NULLs, but a group whose values are
    # ALL NULL still appears in its output (with a NULL percentile) —
    # so count NULL values into the group-by (one scan keeps every
    # key). BOTH paths rank the unfiltered relation with a null-aware
    # conditional sum (NULL rows contribute 0 and carry empty rank
    # intervals), so neither needs a key-set join.
    global _LAST_ROUTE
    if value_buckets == "auto":
        route = _auto_value_buckets(df, key, value, auto_bucket_threshold)
        value_buckets = route.value_buckets
    elif isinstance(value_buckets, str):
        raise ValueError(
            f"exact_percentiles: value_buckets must be 'auto', None, or an "
            f"int, got {value_buckets!r}"
        )
    else:
        route = PercentileRoute("forced", value_buckets)
    # the routing decision is observable (last_route) — see
    # PercentileRoute for why this is a record, not df.observe()
    _LAST_ROUTE = route
    counted = df.groupBy(key, value).agg(F.count(F.lit(1)).alias("_c"))
    fused_single_window = not (value_buckets and value_buckets > 1)
    if fused_single_window:
        # FUSED single-window path (r10 optimization, guide §2.4):
        # rank over the UNFILTERED grouped relation with a null-aware
        # conditional sum instead of filtering nulls out and
        # left-joining a separately-derived key set back. NULLs sort
        # first, contribute 0 to the running count, and the null row's
        # empty (_lo == _hi == 0) rank interval can never bracket a
        # target rank — so every rank/interpolation value is
        # bit-identical to the filtered form while the plan drops one
        # full scan of the key column (Catalyst pruned the old
        # keys-relation into a SECOND table scan), one exchange, and
        # the broadcast join; the final groupBy(key) reuses the
        # window's hashpartitioning(key) exchange.
        _nn = F.when(F.col(value).isNotNull(), F.col("_c")).otherwise(
            F.lit(0)
        )
        wk = Window.partitionBy(key)
        w = wk.orderBy(value)
        cum = (
            counted.withColumn("_hi", F.sum(_nn).over(w))
            .withColumn("_lo", F.col("_hi") - _nn)
            .withColumn("_n", F.sum(_nn).over(wk))
        )
    else:
        # materialize the grouped relation ONCE: the bucketed branch's
        # boundary sketch is a separate action, and without the
        # checkpoint the heavy groupBy(key, value) shuffle would run
        # twice (r10). The relation goes in UNFILTERED — NULL-value
        # rows ride the two-level cumulation with zero contribution
        # (see _bucketed_cumulative), which is what made the key-set
        # distinct + null-safe left join the r10 branch still paid
        # deletable (r11, guide §2.4: one less join, one less
        # exchange, one less aggregate on the at-scale route)
        counted = counted.localCheckpoint(eager=True)
        cum = _bucketed_cumulative(counted, key, value, value_buckets)
    aggs = []
    for p in ps:
        k = (F.col("_n") - 1) * F.lit(float(p))
        kf = F.floor(k)
        # value occupying 0-based rank kf / kf+1 (rank r lives in the
        # unique row with _lo <= r < _hi)
        v_lo = F.max(
            F.when((F.col("_lo") <= kf) & (kf < F.col("_hi")), F.col(value))
        )
        v_hi = F.max(
            F.when((F.col("_lo") <= kf + 1) & (kf + 1 < F.col("_hi")), F.col(value))
        )
        frac = F.max(k - kf)
        # "%g" keeps distinct ps distinct: 0.5 → p50, 0.125 → p12_5
        name = prefix + f"{p * 100:g}".replace(".", "_").replace("-", "m")
        aggs.append(
            (v_lo + frac * (F.coalesce(v_hi, v_lo) - v_lo)).alias(name)
        )
    if with_min_max:
        # like the builtin min/max these ignore NULL values; an
        # all-NULL group's aggregates see no qualifying rows and
        # yield NULL on either path
        aggs.append(F.min(value).alias("vmin"))
        aggs.append(F.max(value).alias("vmax"))
    # BOTH paths now rank the unfiltered relation, so every key —
    # NULL keys and all-NULL-value groups included — survives into
    # `cum` with its (key, NULL) row and the final groupBy needs no
    # key-set join (the r10 fused argument, generalized to the
    # bucketed route in r11)
    return cum.groupBy(key).agg(*aggs)
