"""Executed-stage shuffle metrics, readable WITHOUT the Spark UI.

The round-5/6 shuffle studies (BASELINE.md: bucketed probes, hashed
grams, Bloom prefilter) were measured through the UI REST API — fine
for one-off studies, useless as CI regression pins because the test
session runs with ``spark.ui.enabled=false``. The UI, however, is only
a VIEW over the driver's AppStatusStore, and that store exists (and
keeps per-stage shuffle write totals) regardless of the UI flag — so a
test can snapshot it around an action and assert a shuffle budget.

The numbers are the same ones the UI's stage table shows:
``shuffleWriteBytes`` / ``shuffleWriteRecords`` summed over completed
stages. Records are deterministic for a deterministic plan+data (use
them for tight pins); bytes wobble a little with serialization and
compression (bound them loosely).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession


class ShuffleMetricsUnavailable(RuntimeError):
    """The AppStatusStore JVM internals this module reads changed
    shape (a Spark version bump) — shuffle metrics cannot be measured.
    The budget tests catch this and skip instead of failing on an
    opaque py4j error."""


def _stage_shuffle_map(
    spark: SparkSession,
) -> dict[tuple[int, int], tuple[int, int, int, int]]:
    """{(stageId, attemptId): (shuffleWriteBytes, shuffleWriteRecords,
    memoryBytesSpilled, diskBytesSpilled)} for every stage the status
    store currently RETAINS.

    Raises ShuffleMetricsUnavailable when the private[spark] surface it
    reads (listenerBus().waitUntilEmpty(), the 5-arg stageList) no
    longer matches — these are JVM internals with no compatibility
    promise, and a minor-version bump must degrade to a clear message,
    not an opaque Py4JError in every budget pin."""
    from py4j.protocol import Py4JError

    sc = spark.sparkContext
    try:
        # the store is fed by the ASYNC listener bus: without draining
        # it, a snapshot taken right after an action misses that
        # action's stages and two back-to-back measurements read
        # identical totals
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        store = sc._jsc.sc().statusStore()
        jvm = sc._jvm
        # py4j sees no Scala default args: pass stageList's full
        # signature (statuses, details, withSummaries,
        # unsortedQuantiles, taskStatus)
        stages = store.stageList(
            jvm.java.util.ArrayList(),
            False,
            False,
            sc._gateway.new_array(jvm.double, 0),
            jvm.java.util.ArrayList(),
        )
    except Py4JError as exc:
        # ONLY the JVM-drift signal maps to the skip-grade error: a
        # Python-side AttributeError/TypeError here would be a coding
        # bug in THIS function, and classifying it as version drift
        # would silently skip every shuffle-budget pin (the exact
        # regressions those pins guard) — let it propagate
        raise ShuffleMetricsUnavailable(
            "shuffle metrics unavailable on this Spark version: the "
            "AppStatusStore internals (listenerBus/stageList) no "
            "longer match the expected signature — re-derive them "
            f"against the new Spark ({exc})"
        ) from exc
    out: dict[tuple[int, int], tuple[int, int, int, int]] = {}
    try:
        it = stages.iterator()
        while it.hasNext():
            s = it.next()
            out[(s.stageId(), s.attemptId())] = (
                s.shuffleWriteBytes(),
                s.shuffleWriteRecords(),
                s.memoryBytesSpilled(),
                s.diskBytesSpilled(),
            )
    except Py4JError as exc:
        # same narrowing as above: JVM accessor drift only
        raise ShuffleMetricsUnavailable(
            "shuffle metrics unavailable on this Spark version: the "
            "stage-data accessor names changed — re-derive them "
            f"against the new Spark ({exc})"
        ) from exc
    return out


def shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """(bytes, records) of shuffle WRITE across every stage the status
    store currently retains. NOT a monotonic counter: the store evicts
    completed stages past ``spark.ui.retainedStages`` (default 1000),
    so in a long session totals can DROP as old stages age out — never
    diff two of these to budget an action, use ``measure_shuffle``,
    which diffs per-stage IDs and is immune to eviction of pre-action
    stages."""
    totals = tuple(map(sum, zip(*_stage_shuffle_map(spark).values())))
    return (totals[0], totals[1]) if totals else (0, 0)


def measure_shuffle(
    spark: SparkSession, action: Callable[[], object]
) -> tuple[int, int]:
    """Run ``action()`` and return the (bytes, records) it shuffled.

    Sums ONLY stages that appear (or re-attempt) between the two
    snapshots, keyed by (stageId, attemptId) — so stages evicted from
    the status store's retention window (spark.ui.retainedStages,
    default 1000) between snapshots never skew the measurement the way
    a totals-diff would after a long test session. The action itself
    must complete well under the retention window (~1000 stages) or
    its own earliest stages age out before the second snapshot; the
    probe actions in tests/test_shuffle_budgets.py run a handful.

    The caller must not run concurrent jobs on the session while
    measuring (pytest's serial execution satisfies this). Skipped
    stages (reused exchanges) contribute nothing new — exactly the
    accounting a budget wants."""
    new = _new_stage_metrics(spark, action)
    return sum(v[0] for v in new), sum(v[1] for v in new)


def _new_stage_metrics(
    spark: SparkSession, action: Callable[[], object]
) -> list[tuple[int, int, int, int]]:
    """The shared snapshot-diff core of measure_shuffle/measure_spill:
    run ``action()`` and return the metric tuples of stages that
    appeared (or re-attempted) during it — stage-keyed, so eviction of
    pre-action stages from the status store never skews the diff. One
    implementation so a future accounting fix cannot land one-sided."""
    before = _stage_shuffle_map(spark)
    action()
    after = _stage_shuffle_map(spark)
    return [v for k, v in after.items() if k not in before]


def measure_spill(
    spark: SparkSession, action: Callable[[], object]
) -> tuple[int, int]:
    """Run ``action()`` and return the (memoryBytesSpilled,
    diskBytesSpilled) its new stages recorded — the same
    snapshot-diff accounting as ``measure_shuffle`` (stage-keyed,
    eviction-immune), reading the spill counters the UI's stage table
    shows. Used by the spill-regime parity tests: the one execution
    regime local[32]/128 GiB never enters on its own is external
    sort/agg spill, so those tests force it via the SQL spill
    thresholds and assert HERE that a spill actually happened while
    the oracle hash stays green."""
    new = _new_stage_metrics(spark, action)
    return sum(v[2] for v in new), sum(v[3] for v in new)


def measure_sql_metric(
    spark: SparkSession,
    action: Callable[[], object],
    metric_name: str,
    node_name: str | None = None,
) -> int:
    """Run ``action()`` and sum the named SQL metric across the SQL
    executions it produced — the per-OPERATOR counters the SQL tab
    shows (e.g. ObjectHashAggregate's "number of sort fallback
    tasks"), which stage-level spill counters can't see.

    Needed because some alternate execution regimes leave no
    stage-level trace at test scale: forcing
    spark.sql.objectHashAggregate.sortBased.fallbackThreshold low
    makes a collect_list aggregation run its SORT-BASED path (the
    regime a memory-pressured 100 TB aggregation enters), but with
    small groups the fallback sorter never actually hits disk, so
    memoryBytesSpilled stays 0 — the operator metric is the honest
    "regime was live" signal.

    Matching: a plan-graph node participates when ``node_name`` is
    None or a substring of the node's name, and its metric's NAME
    contains ``metric_name``. Values are the UI's formatted strings
    ("4", "0.0 B", "total (min, med, max ...)"): the leading integer
    is taken, non-numeric-leading values are skipped. Same
    execution-id snapshot diff as measure_shuffle, same
    ShuffleMetricsUnavailable contract on JVM drift."""
    import re

    from py4j.protocol import Py4JError

    def _exec_ids(store) -> set[int]:
        ids = set()
        lst = store.executionsList()
        for i in range(lst.size()):
            ids.add(lst.apply(i).executionId())
        return ids

    sc = spark.sparkContext
    try:
        store = spark._jsparkSession.sharedState().statusStore()
        before = _exec_ids(store)
        action()
        sc._jsc.sc().listenerBus().waitUntilEmpty()
        total = 0
        for eid in _exec_ids(store) - before:
            mets = store.executionMetrics(eid)
            it = store.planGraph(eid).allNodes().iterator()
            while it.hasNext():
                node = it.next()
                if node_name is not None and node_name not in node.name():
                    continue
                mit = node.metrics().iterator()
                while mit.hasNext():
                    m = mit.next()
                    if metric_name not in m.name():
                        continue
                    opt = mets.get(m.accumulatorId())
                    if not opt.isDefined():
                        continue
                    match = re.match(r"\s*([\d,]+)", str(opt.get()))
                    if match:
                        total += int(match.group(1).replace(",", ""))
        return total
    except Py4JError as exc:
        raise ShuffleMetricsUnavailable(
            "SQL metrics unavailable on this Spark version: the "
            "SQLAppStatusStore internals (executionsList/planGraph/"
            "executionMetrics) no longer match the expected "
            f"signature — re-derive them against the new Spark ({exc})"
        ) from exc
