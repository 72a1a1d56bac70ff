"""Event-time state timeout: a session must be emitted when the
watermark passes its gap even though its user receives NO further
events — the semantics only GroupStateTimeout.EventTimeTimeout can
express (q39's NoTimeout operator would hold that state forever)."""

from __future__ import annotations

import os
import time
import uuid

import pytest

from eeg_data_lake_spark.workload.streaming import sessionize_closed_on_timeout

T0 = "2024-01-01 00:00:00"


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    """Batch 1: user 1 has two bursts 2 h apart (the first closes
    in-batch) plus user 2's first burst. Batch 2: ONLY user 2 events
    6 h later — they advance the watermark past user 1's open session,
    which must close by timeout with no user-1 rows present."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    rows1 = [
        (1, 101, "2024-01-01 00:00:00"),
        (1, 102, "2024-01-01 00:05:00"),
        (1, 103, "2024-01-01 02:30:00"),  # > 1h gap → burst 2
        (2, 201, "2024-01-01 02:00:00"),
    ]
    rows2 = [
        (2, 202, "2024-01-01 08:00:00"),
        (2, 203, "2024-01-01 08:01:00"),
    ]
    for i, rows in enumerate((rows1, rows2)):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts string"
        ).selectExpr("user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts")
        df.coalesce(1).write.parquet(os.path.join(d, f"b{i}"))
        target = time.time() - 100 + i * 30
        for root, _dirs, files in os.walk(os.path.join(d, f"b{i}")):
            for f in files:
                os.utime(os.path.join(root, f), (target, target))
    return d


def test_timeout_closes_quiet_users_session(spark, two_batch_dir):
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(two_batch_dir)
    )
    name = "toq_" + uuid.uuid4().hex[:8]
    q = (
        sessionize_closed_on_timeout(stream, gap_s=3600.0, watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.table(name).collect()
    }
    # user 1 burst 1 closed IN-BATCH by the 02:30 event
    assert (1, "2024-01-01 00:00:00", 2) in got
    # user 1 burst 2 (single 02:30 event) closed by TIMEOUT: watermark
    # from batch 2 (08:01 - 1 min) passed 02:30 + 1 h with no user-1 rows
    assert (1, "2024-01-01 02:30:00", 1) in got
    # user 2's burst 1 closed when batch 2's 08:00 event broke the gap
    assert (2, "2024-01-01 02:00:00", 1) in got
    # user 2's final burst is still OPEN (nothing advanced the watermark
    # past 08:01 + 1 h) → must NOT be emitted
    assert not any(u == 2 and s.startswith("2024-01-01 08:") for u, s, _ in got)
