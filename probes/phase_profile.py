"""Phase-level wall attribution for the most expensive bench queries
(z29 streaming ESD, z25 chunkstore lifecycle): re-run each query's body
with timers around its internal phases so the optimization targets the
phase that actually costs, not the one that looks expensive.

Run AFTER a warm pass (the bench measures steady state); numbers here
are for RELATIVE attribution on a possibly-contended host.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from eeg_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.marks = []

    def mark(self, label):
        now = time.perf_counter()
        self.marks.append((label, now - self.t0))
        self.t0 = now

    def report(self, name):
        total = sum(w for _, w in self.marks)
        print(f"--- {name} total={total:.3f}s")
        for label, w in self.marks:
            print(f"    {label:38s} {w:7.3f}s  {100*w/total:5.1f}%")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_z29(spark, run=0):
    from eeg_data_lake_spark.sources.txlog import TxTable
    from eeg_data_lake_spark.streaming.exactsubstr import (
        exact_substring_removal,
        stream_exactsubstr_ingest,
    )
    from eeg_data_lake_spark.workload.streaming import _staged_doc_batches

    t = T()
    d, src = _staged_doc_batches(spark, SF_DIR, "prof_esd_", ["doc_id", "text"])
    t.mark("stage 3 batch files")
    tbl = TxTable(spark, os.path.join(d, "corpus"))
    stream_exactsubstr_ingest(
        spark, src, "doc_id bigint, text string", tbl,
        os.path.join(d, "ck"), sink_id="z29",
    )
    t.mark("stream drain (3 triggers)")
    out = exact_substring_removal(tbl).orderBy("doc_id")
    t.mark("removal plan build")
    _noop(out)
    t.mark("removal execute")
    t.report(f"z29 run{run}")


def profile_z25(spark, run=0):
    from eeg_data_lake_spark.functions.multimodal import attach_binary_payload
    from eeg_data_lake_spark.sources.chunkstore import ChunkStore
    from eeg_data_lake_spark.sources.readers import read_testdata
    from eeg_data_lake_spark.workload.multimodal import _scratch_dir

    t = T()
    blobs = attach_binary_payload(
        read_testdata(spark, SF_DIR, "documents")
    ).select("doc_id", "payload")
    store = ChunkStore(spark, _scratch_dir("prof_cs_"))
    store.put(blobs, txn_id="z25-put")
    t.mark("put (chunk+probe+append+upsert)")
    store.delete_docs(F.col("doc_id") % 2 == 1, txn_id="z25-delete")
    t.mark("delete_docs (overwrite)")
    gc_report = store.gc(txn_id="z25-gc")
    t.mark("gc (2 aggs + overwrite)")
    rec = store.reconstruct().select(
        "doc_id", F.col("payload").alias("rec_payload"), "missing_chunks"
    )
    live = blobs.filter(F.col("doc_id") % 2 == 0)
    checks = live.join(rec, "doc_id", "left").agg(
        F.count("*").alias("docs_live"),
        F.sum(
            (
                F.md5(F.col("payload"))
                != F.md5(F.coalesce("rec_payload", F.lit(b"")))
            ).cast("long")
        ).alias("reconstruct_mismatches"),
        F.sum(F.coalesce("missing_chunks", F.lit(1)).cast("long")).alias(
            "missing_refs"
        ),
    )
    docs_put = blobs.agg(F.count("*").alias("docs_put"))
    out = docs_put.crossJoin(checks).crossJoin(gc_report)
    t.mark("final plan build")
    _noop(out)
    t.mark("reconstruct+checks execute")
    t.report(f"z25 run{run}")


def main():
    spark = get_spark(app_name="phase-profile")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1:] or ["z29", "z25"]
    for run in range(2):  # run 0 = warmup-ish, run 1 = steady
        if "z29" in which:
            profile_z29(spark, run)
        if "z25" in which:
            profile_z25(spark, run)
    spark.stop()


if __name__ == "__main__":
    main()
