"""Native session_window in a STREAMING aggregation (q62 covers the
batch form): gap-based sessions grow while events keep arriving within
the gap, merge when a bridging event connects two open sessions, and
only emit (append mode) once the watermark passes the session end."""

from __future__ import annotations

import datetime as dt
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


def _write(path: str, rows: list[tuple[int, int, dt.datetime]]) -> None:
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, path)


def test_streaming_session_window_merge_and_emit(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = tmp_path / "sess_src"
    os.makedirs(src)
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    m = dt.timedelta(minutes=1)

    # batch 1: user 1 has two bursts 9:00-9:02 and 9:09-9:10 — farther
    # apart than the 5-min gap, so they are two OPEN sessions so far.
    _write(
        str(src / "a.parquet"),
        [
            (1, 1, base),
            (1, 2, base + 2 * m),
            (1, 3, base + 9 * m),
            (1, 4, base + 10 * m),
        ],
    )
    # batch 2: a bridging event at 9:05 MERGES them into one session
    # (each pairwise gap is now <= 5 min), plus a watermark-pusher from
    # another user far in the future so the merged session closes.
    _write(
        str(src / "b.parquet"),
        [
            (1, 5, base + 5 * m),
            (2, 99, base + dt.timedelta(hours=3)),
        ],
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    name = "sw_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r.user_id, r.session_start): r
            for r in spark.table(name).collect()
        }
        # user 1: ONE merged session 9:00 → 9:15 (last event + gap)
        # with all 5 events — the two open sessions fused by the bridge
        merged = rows[(1, base)]
        assert merged.n_events == 5
        assert merged.session_end == base + 15 * m
        assert len([k for k in rows if k[0] == 1]) == 1
        # user 2's session is still open (nothing pushed the watermark
        # past it), so append mode has not emitted it
        assert len([k for k in rows if k[0] == 2]) == 0
    finally:
        q.stop()


def test_q62_exact_gap_boundary_matches_oracle(spark, tmp_path):
    """Spark's session_window merges per-event [t, t+gap) windows when
    they TOUCH, so an event exactly gap seconds after the previous one
    stays in the SAME session (verified empirically here) — the
    oracle's lag condition must be strict > to agree. The shipped
    corpus has no exact-1h gaps, so this pins the boundary semantics
    on a purpose-built one."""
    import datetime as dt

    import duckdb

    from eeg_data_lake_spark.workload.registry import REGISTRY
    from tests.oracle_utils import compare

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: gap EXACTLY 3600 s -> windows touch -> ONE session
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(seconds=3600)),
        # user 2: gap 3599 s -> one session
        (2, 3, t0),
        (2, 4, t0 + dt.timedelta(seconds=3599)),
        # user 3: gap 3601 s -> two sessions
        (3, 5, t0),
        (3, 6, t0 + dt.timedelta(seconds=3601)),
    ]
    d = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )
    d.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    e = REGISTRY["q62_native_session_windows"]
    got = {
        r.user_id: r.n_sessions
        for r in e.spark_fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    problems = compare(
        e.spark_fn(spark, str(tmp_path)), con.sql(e.oracle).fetchdf(), "q62"
    )
    assert not problems, problems
