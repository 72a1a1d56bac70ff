"""Terminal-read flatness probe for the incrementally-maintained
components state (round-10 verdict task 2).

Question: as triggers accumulate on a resolved near-dup corpus, does
``resolve_accepted``'s wall stay FLAT under the incremental components
scan, while the old full-graph-CC path (use_components=False) grows
with the accumulated edge history?

Protocol: drain the sf docs corpus into a MinHash resolved state in
N_TRIGGERS small batches with a dup-heavy mutation (every doc re-sent
in 3 variants so edges genuinely accumulate), measuring
``resolve_accepted(...).count()`` wall at fixed checkpoints through
the drain for BOTH paths (incremental first, then full — same state,
both answers asserted equal). Walls carry the python-loop calibration
anchor so cross-run comparisons can divide out host steal.

Run: python probes/incremental_resolve.py [sf_dir] [n_triggers]
Prints one JSON line per checkpoint + a summary line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.sources.txlog import TxTable  # noqa: E402
from eeg_data_lake_spark.streaming.resolved import (  # noqa: E402
    minhash_resolved_family,
    resolve_accepted,
    resolved_batch_writer,
)


def loop_anchor() -> float:
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        sum(i * i for i in range(2_000_000))
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    return round(best, 4)


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_triggers = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark(
        app_name="incremental-resolve-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_docs = docs.count()
    import tempfile

    d = tempfile.mkdtemp(prefix="incres_probe_")
    tbl = TxTable(spark, f"{d}/corpus")
    fam = minhash_resolved_family()
    w = resolved_batch_writer(tbl, fam, "probe")

    checkpoints = sorted(
        {n_triggers // 4, n_triggers // 2, (3 * n_triggers) // 4, n_triggers}
    )
    report = []
    for i in range(n_triggers):
        # the re-crawl shape: every trigger re-sends the WHOLE corpus
        # under fresh ids, so each batch collides with everything
        # ingested so far — edges accumulate linearly with triggers
        # (cross pairs link to the FIRST indexer: star components,
        # shallow diameter), and the terminal full-CC pass has a
        # genuinely growing history to chew on while the incremental
        # state stays one assertion row per losing doc
        batch = docs.select(
            (F.col("doc_id") * 1000 + F.lit(i)).alias("doc_id"),
            "text",
            "lang",
        )
        w(batch, i)
        if (i + 1) in checkpoints:
            inc_w, inc_n = timed_count(resolve_accepted(tbl))
            full_w, full_n = timed_count(
                resolve_accepted(tbl, use_components=False)
            )
            assert inc_n == full_n, (inc_n, full_n)
            edges = TxTable(spark, tbl.path + "_edges").read().count()
            row = {
                "triggers": i + 1,
                "edges_accumulated": edges,
                "resolve_incremental_s": inc_w,
                "resolve_full_cc_s": full_w,
                "resolved_docs": inc_n,
                "loop_anchor_s": loop_anchor(),
            }
            report.append(row)
            print(json.dumps(row), flush=True)

    first, last = report[0], report[-1]
    print(
        json.dumps(
            {
                "summary": "terminal-read growth first->last checkpoint",
                "triggers": [first["triggers"], last["triggers"]],
                "incremental_growth": round(
                    last["resolve_incremental_s"]
                    / max(first["resolve_incremental_s"], 1e-9),
                    2,
                ),
                "full_cc_growth": round(
                    last["resolve_full_cc_s"]
                    / max(first["resolve_full_cc_s"], 1e-9),
                    2,
                ),
                "incremental_vs_full_at_last": round(
                    last["resolve_incremental_s"]
                    / max(last["resolve_full_cc_s"], 1e-9),
                    2,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
