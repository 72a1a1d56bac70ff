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


def shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """(bytes, records) of shuffle WRITE across every stage the app
    has completed so far — a monotonic counter; diff two snapshots to
    budget one action (or use ``measure_shuffle``)."""
    sc = spark.sparkContext
    # the store is fed by the ASYNC listener bus: without draining it,
    # a snapshot taken right after an action misses that action's
    # stages and two back-to-back measurements read identical totals
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    # py4j sees no Scala default args: pass stageList's full signature
    # (statuses, details, withSummaries, unsortedQuantiles, taskStatus)
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        sc._gateway.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    tot_b = tot_r = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        tot_b += s.shuffleWriteBytes()
        tot_r += s.shuffleWriteRecords()
    return tot_b, tot_r


def measure_shuffle(
    spark: SparkSession, action: Callable[[], object]
) -> tuple[int, int]:
    """Run ``action()`` and return the (bytes, records) it shuffled.

    Snapshot-diff over the app-wide totals, so the caller must not run
    concurrent jobs on the session while measuring (pytest's serial
    execution satisfies this). Skipped stages (reused exchanges)
    contribute nothing new — exactly the accounting a budget wants."""
    b0, r0 = shuffle_totals(spark)
    action()
    b1, r1 = shuffle_totals(spark)
    return b1 - b0, r1 - r0
