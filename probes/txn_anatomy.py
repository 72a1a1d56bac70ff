"""Per-commit anatomy of the txlog write path under z29 / z25 / z31:
monkeypatch-timers around TxTable._write_data (the Spark parquet write
job), TxTable._file_stats (pyarrow footer reads), TxTable._commit's
manifest fsync+link, and _replay (driver-side log fold), so the
"per-trigger fixed cost" the round-10 phase profile flagged is
attributed to the phase that actually costs before anything is
restructured (guide §1.1).

Run after a warm pass; prints one table per query run.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.sources import txlog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ACC: dict[str, list[float]] = defaultdict(list)


def _wrap(cls, name: str, label: str):
    orig = getattr(cls, name)

    def timed(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        ACC[label].append(time.perf_counter() - t0)
        return out

    timed.__wrapped__ = orig
    setattr(cls, name, timed)


def install():
    _wrap(txlog.TxTable, "_write_data", "write_data(spark job)")
    _wrap(txlog.TxTable, "_file_stats", "file_stats(footers)")
    _wrap(txlog.TxTable, "_replay", "replay(log fold)")
    _wrap(txlog.TxTable, "_commit", "commit(total incl stats+replay)")
    _wrap(txlog.TxTable, "append", "append(total)")
    _wrap(txlog.TxTable, "upsert", "upsert(total)")
    _wrap(txlog.TxTable, "overwrite", "overwrite(total)")


def report(tag: str, wall: float):
    print(f"--- {tag}: wall={wall:.3f}s")
    for label in sorted(ACC):
        v = ACC[label]
        print(
            f"    {label:32s} n={len(v):3d} total={sum(v):7.3f}s "
            f"mean={sum(v)/len(v):6.3f}s"
        )
    ACC.clear()


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_z29(spark):
    from eeg_data_lake_spark.sources.txlog import TxTable
    from eeg_data_lake_spark.streaming.exactsubstr import (
        exact_substring_removal,
        stream_exactsubstr_ingest,
    )
    from eeg_data_lake_spark.workload.streaming import _staged_doc_batches

    t0 = time.perf_counter()
    d, src = _staged_doc_batches(spark, SF_DIR, "txa_esd_", ["doc_id", "text"])
    t_stage = time.perf_counter() - t0
    tbl = TxTable(spark, os.path.join(d, "corpus"))
    t1 = time.perf_counter()
    stream_exactsubstr_ingest(
        spark, src, "doc_id bigint, text string", tbl,
        os.path.join(d, "ck"), sink_id="z29",
    )
    t_drain = time.perf_counter() - t1
    t2 = time.perf_counter()
    _noop(exact_substring_removal(tbl).orderBy("doc_id"))
    t_rm = time.perf_counter() - t2
    print(f"z29 stage={t_stage:.3f}s drain={t_drain:.3f}s removal={t_rm:.3f}s")
    report("z29 txn anatomy (drain+removal)", t_drain + t_rm)


def run_z25(spark):
    from pyspark.sql import functions as F

    from eeg_data_lake_spark.functions.multimodal import attach_binary_payload
    from eeg_data_lake_spark.sources.chunkstore import ChunkStore
    from eeg_data_lake_spark.sources.readers import read_testdata
    from eeg_data_lake_spark.workload.multimodal import _scratch_dir

    blobs = attach_binary_payload(
        read_testdata(spark, SF_DIR, "documents")
    ).select("doc_id", "payload")
    store = ChunkStore(spark, _scratch_dir("txa_cs_"))
    marks = []
    t0 = time.perf_counter()
    store.put(blobs, txn_id="z25-put")
    marks.append(("put", time.perf_counter() - t0))
    report("z25 put", marks[-1][1])
    t0 = time.perf_counter()
    store.delete_docs(F.col("doc_id") % 2 == 1, txn_id="z25-delete")
    marks.append(("delete", time.perf_counter() - t0))
    report("z25 delete", marks[-1][1])
    t0 = time.perf_counter()
    store.gc(txn_id="z25-gc")
    marks.append(("gc", time.perf_counter() - t0))
    report("z25 gc", marks[-1][1])
    t0 = time.perf_counter()
    _noop(store.reconstruct())
    marks.append(("reconstruct", time.perf_counter() - t0))
    report("z25 reconstruct", marks[-1][1])
    print("z25 phases: " + " ".join(f"{k}={v:.3f}s" for k, v in marks))


def main():
    spark = get_spark(app_name="txn-anatomy")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1:] or ["z29", "z25"]
    # warm pass (uninstrumented)
    if "z29" in which:
        run_z29(spark)
    if "z25" in which:
        run_z25(spark)
    print("=== instrumented steady runs ===")
    install()
    for _ in range(2):
        if "z29" in which:
            run_z29(spark)
        if "z25" in which:
            run_z25(spark)
    spark.stop()


if __name__ == "__main__":
    main()
