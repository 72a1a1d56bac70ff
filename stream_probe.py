"""Streaming-throughput probe: events through the real Structured
Streaming path (file source → watermark → tumbling agg → exactly-once
txlog sink), 10 micro-batches, end-to-end rows/s.

The batch bench (bench.py) covers query throughput; this measures the
streaming engine's per-micro-batch machinery — offset tracking,
watermark advance, state store updates, and the transactional sink
commit — which is what bounds a production ingest loop. Results are
recorded in BASELINE.md.

Run: python stream_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.sources.txlog import TxTable  # noqa: E402

SRC = "/root/testdata/sf0.1/events.parquet"
WORK = "/tmp/stream_probe"
N_FILES = int(os.environ.get("STREAM_PROBE_FILES", "10"))


def main() -> None:
    spark = get_spark(
        app_name="stream-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    src_dir = f"{WORK}/src"
    os.makedirs(src_dir)
    ev = spark.read.parquet(SRC)
    n_rows = ev.count()
    # N_FILES single-file batches, deterministic split by event_id
    for i in range(N_FILES):
        part = ev.filter(F.pmod("event_id", F.lit(N_FILES)) == i).coalesce(1)
        tmp = f"{WORK}/stage_{i}"
        part.write.parquet(tmp)
        pf = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(f"{tmp}/{pf}", f"{src_dir}/file_{i}.parquet")

    table = TxTable(spark, f"{WORK}/gold")

    def sink(batch_df, batch_id):
        table.append(batch_df, txn_id=f"probe:batch-{batch_id}")

    t0 = time.perf_counter()
    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        # testdata timestamps are NTZ; watermarks require TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("day"), "event_type", "n", "sum_value")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{WORK}/ckpt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)
    out_rows = table.read().count()
    print(
        json.dumps(
            {
                "metric": "streaming_ingest_wall_seconds",
                "value": wall,
                "unit": "sec",
                "input_rows": n_rows,
                "micro_batches": N_FILES,
                "rows_per_sec": round(n_rows / wall),
                "sink_rows": out_rows,
                "sink_commits": table.version() + 1,
            }
        )
    )
    _dedup_ingest_probe(spark)


def _dedup_ingest_probe(spark, n_batches: int = 5) -> None:
    """Incremental-dedup ingest throughput: the sf0.1 documents table
    through the streaming SimHash path (fingerprint + within-batch CC
    + block-index probe + two txlog commits per batch) — the cost of
    maintaining global near-dup state online, vs the plain agg ingest
    above whose per-batch machinery has no dedup work."""
    from eeg_data_lake_spark.streaming.simhash import stream_simhash_ingest

    work = f"{WORK}/simhash"
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_docs = docs.count()
    src_dir = f"{work}/src"
    os.makedirs(src_dir)
    for i in range(n_batches):
        part = docs.filter(F.pmod("doc_id", F.lit(n_batches)) == i).coalesce(1)
        tmp = f"{work}/stage_{i}"
        part.write.parquet(tmp)
        pf = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(f"{tmp}/{pf}", f"{src_dir}/file_{i}.parquet")
    table = TxTable(spark, f"{work}/accepted")
    t0 = time.perf_counter()
    stream_simhash_ingest(
        spark,
        src_dir,
        "doc_id bigint, text string, lang string",
        table,
        f"{work}/ckpt",
        sink_id="probe",
    )
    wall = round(time.perf_counter() - t0, 3)
    accepted = table.read().count()
    print(
        json.dumps(
            {
                "metric": "streaming_simhash_ingest_wall_seconds",
                "value": wall,
                "unit": "sec",
                "input_docs": n_docs,
                "micro_batches": n_batches,
                "docs_per_sec": round(n_docs / wall),
                "accepted_docs": accepted,
                "rejected_docs": n_docs - accepted,
            }
        )
    )


if __name__ == "__main__":
    main()
