"""Watermark semantics with real late data across micro-batches:
append-mode windows only emit once the watermark passes them, and
rows arriving later than the watermark allows are dropped — the
engine-level late-data contract the reference has no analogue for
(its ingest is batch-only)."""

from __future__ import annotations

import datetime as dt
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(path: str, rows: list[tuple[int, dt.datetime]]) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, path)


def test_append_mode_drops_too_late_rows(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = tmp_path / "stream_src"
    os.makedirs(src)
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    # batch 1: three rows in [10:00, 11:00) and one at 12:05 that pushes
    # the watermark (30 min) to 11:35 — far past the 10:00 window's end.
    _write(
        str(src / "a.parquet"),
        [
            (1, base),
            (2, base + dt.timedelta(minutes=10)),
            (3, base + dt.timedelta(minutes=20)),
            (4, base + dt.timedelta(hours=2, minutes=5)),
        ],
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    name = "wm_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.window_start: r.n for r in spark.table(name).collect()
        }
        # the [10:00, 11:00) window is closed (watermark 11:35) and
        # emitted with its 3 rows; the 12:00 window stays open
        assert first.get(base) == 3
        assert base + dt.timedelta(hours=2) not in first

        # batch 2: a LATE row for the already-closed 10:00 window
        # (< watermark ⇒ dropped) plus a 13:10 row that closes 12:00.
        time.sleep(1.05)  # distinct mtime so the file source orders it second
        _write(
            str(src / "b.parquet"),
            [
                (5, base + dt.timedelta(minutes=30)),      # too late, dropped
                # pushes the watermark to 13:10 ≥ the 12:00 window's end,
                # so that window closes and emits
                (6, base + dt.timedelta(hours=3, minutes=40)),
            ],
        )
        q.processAllAvailable()
        final = {r.window_start: r.n for r in spark.table(name).collect()}
    finally:
        q.stop()

    # late row did NOT reopen/duplicate the 10:00 window…
    assert final[base] == 3
    assert list(final.values()).count(3) == 1
    # …and the 12:00 window emitted exactly its one on-time row
    assert final.get(base + dt.timedelta(hours=2)) == 1


def test_dropped_late_rows_are_observable(spark, tmp_path):
    """numRowsDroppedByWatermark in the query progress confirms the
    drop happened in the state store (not a lost file)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = tmp_path / "obs_src"
    os.makedirs(src)
    base = dt.datetime(2024, 3, 1, 9, 0, 0)
    _write(str(src / "a.parquet"), [(1, base), (2, base + dt.timedelta(hours=3))])
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    name = "wmobs_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        time.sleep(1.05)
        _write(str(src / "b.parquet"), [(3, base + dt.timedelta(minutes=5))])
        q.processAllAvailable()
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in [q.recentProgress[i] for i in range(len(q.recentProgress))]
            for op in p.get("stateOperators", [])
        )
    finally:
        q.stop()
    assert dropped >= 1


def test_dedup_state_carries_across_micro_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark must drop a duplicate that arrives
    in a LATER micro-batch (while its key is still inside the watermark
    horizon) — the cross-batch state behavior a single-batch run cannot
    distinguish from plain dropDuplicates, and the property q51 relies
    on. A third batch then replays a key whose state HAS been evicted
    (watermark moved past ts + delay): the duplicate passes through,
    pinning the bounded-state semantics (eviction is real, not just an
    optimization)."""
    from pyspark.sql import types as T

    src = tmp_path / "dedup_src"
    os.makedirs(src)
    base = dt.datetime(2024, 5, 1, 8, 0, 0)
    # batch 1: ids 1, 2
    _write(str(src / "a.parquet"), [(1, base), (2, base + dt.timedelta(minutes=5))])
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    name = "ddwm_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: id 2 again (same ts — in state ⇒ dropped) and id 3
        time.sleep(1.05)
        _write(
            str(src / "b.parquet"),
            [
                (2, base + dt.timedelta(minutes=5)),
                (3, base + dt.timedelta(minutes=10)),
            ],
        )
        q.processAllAvailable()
        mid = sorted(r.event_id for r in spark.table(name).collect())
        # batch 3: push the watermark far ahead (id 4 at +6 h ⇒ watermark
        # +5.5 h > all prior ts + 30 min ⇒ ids 1-3 evicted)…
        time.sleep(1.05)
        _write(str(src / "c.parquet"), [(4, base + dt.timedelta(hours=6))])
        q.processAllAvailable()
        # …batch 4: id 1 replayed NOW, long after eviction ⇒ NOT deduped
        time.sleep(1.05)
        _write(str(src / "d.parquet"), [(1, base + dt.timedelta(hours=6, minutes=1))])
        q.processAllAvailable()
        final = sorted(r.event_id for r in spark.table(name).collect())
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()

    assert mid == [1, 2, 3]          # cross-batch duplicate of 2 dropped
    assert final == [1, 1, 2, 3, 4]  # evicted key 1 re-admitted
    assert n_batches >= 4


def test_stream_stream_left_outer_join_emits_null_rows(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join (q52 is the inner form):
    unmatched left rows must emit with NULL right columns — but only
    AFTER the watermark passes their join horizon, because until then
    a match could still arrive. Both behaviors are pinned: the matched
    row emits, and the unmatched click's NULL row appears once a later
    batch advances the watermark past click_ts + 10 min."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = tmp_path / "ss_left_src"
    os.makedirs(src)
    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def _write_events(path, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "kind": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(tbl, path)

    # batch 1: user 7's click gets a purchase 5 min later; user 8's
    # click never does
    _write_events(
        str(src / "a.parquet"),
        [
            (1, 7, "click", base),
            (10, 7, "purchase", base + dt.timedelta(minutes=5)),
            (2, 8, "click", base + dt.timedelta(minutes=1)),
        ],
    )
    # batch 2: far-future events on BOTH streams — the global watermark
    # is min(click wm, purchase wm), so advancing only one side pins it
    # at the other's max; with both at 12:00 (5 min delay) it reaches
    # 11:55, past click 2's horizon (10:11), forcing its NULL emit.
    # Different users so the pair cannot match each other.
    _write_events(
        str(src / "b.parquet"),
        [
            (98, 9, "click", base + dt.timedelta(hours=2)),
            (99, 11, "purchase", base + dt.timedelta(hours=2)),
        ],
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    clicks = (
        stream.filter(F.col("kind") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "5 minutes")
    )
    purchases = (
        stream.filter(F.col("kind") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "5 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id
            AND purchase_ts >= click_ts
            AND purchase_ts <= click_ts + INTERVAL 10 MINUTES
            """
        ),
        "leftOuter",
    )
    name = "ssleft_" + uuid.uuid4().hex[:8]
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # outer-join NULL rows emit one micro-batch AFTER the watermark
        # passes the row's horizon (state eviction uses the PREVIOUS
        # batch's watermark) — drive one more batch to flush, exactly
        # what a live stream's next trigger would do
        _write_events(
            str(src / "c.parquet"),
            [
                (100, 9, "click", base + dt.timedelta(hours=3)),
                (101, 11, "purchase", base + dt.timedelta(hours=3)),
            ],
        )
        q.processAllAvailable()
        out = spark.table(name).toPandas()
    finally:
        q.stop()
    by_click = {
        int(r.click_id): r for _, r in out.iterrows() if pd.notna(r.click_id)
    }
    # matched: click 1 ↔ purchase 10
    assert by_click[1].purchase_id == 10
    # unmatched click 2 emitted with NULL right side after the
    # watermark passed its horizon
    assert 2 in by_click, f"unmatched click row missing: {out}"
    assert pd.isna(by_click[2].purchase_id)
    # click 98 (12:00, horizon 12:10) MAY evict — the engine is free to
    # run a no-data cleanup batch once batch c lifts the watermark to
    # 12:55 — but if it emitted it must be a NULL-match row; click 100
    # (13:00, horizon 13:10 > 12:55) is inside every watermark this
    # stream reached and must never leak as a premature NULL row
    if 98 in by_click:
        assert pd.isna(by_click[98].purchase_id)
    assert 100 not in by_click
