"""Scaling probe: measure the data-bound headline queries at Nx the
largest driver-provided scale factor (sf0.1 -> "sf1-equivalent" at
the default 10 copies, "sf10-equivalent" at 100).

The driver ships sf0.001/0.01/0.1; the 100 TB claim rests on plans
whose cost is linear in the data. This probe REPLICATES sf0.1 N
times with key offsets (and a per-replica text mutation so the
dedup/near-dup queries see a realistically duplicate-heavy corpus, not
degenerate exact copies) into a /tmp dir, then times the same
queries at both scales. Replicated data is a PERF probe only — all
correctness runs stay on the driver's own parquet.

Run: python scaling_probe.py [--copies N] [--passes P] [query ...]
(prints a small JSON report; naming queries probes just that subset —
used to extend BASELINE.md round over round without re-timing the
whole set). --copies 100 is the round-10 second curve point: the
destination is /tmp/sf10_probe and single-pass timing is the default
there (the queries are minutes-long; min-of-2 would double a probe
that already dwarfs the ±25 % host band it tries to beat).
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
from eeg_data_lake_spark.workload import REGISTRY  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_probe"
COPIES = 10

#: data-bound queries (the flat-at-sf0.1 orchestration-floor ones are
#: pointless to replicate)
QUERIES = [
    "q01_pricing_summary",        # scan + hash agg over lineitem
    "q10_price_percentiles",      # sort-based exact percentile
    "q27_top_tokens",             # explode + vocab agg
    "q33_neardup_shingle_jaccard",# posting-list near-dup (dup-heavy!)
    "q43_tfidf_top_terms",        # explode + 3 hash aggs
    "r27_crossdoc_segment_dedup", # segment DF + join-back + re-agg
    "r30_token_shard_packing",    # two-phase prefix sum
    "r33_rolling_p95",            # day-array window
    "q37_cosine_topk",            # broadcast-query matmul-free scoring
    "r45_audio_pcm_features",     # Arrow-batched Python codec (per-row cost)
    "r47_dsir_importance_resample",  # explode + 256-bucket broadcast fold
    "r53_interval_overlap_join",  # bin-and-verify pair join (output grows 10x)
    "r67_cusum_changepoint",      # O(1)/row windows over 10x-longer series
    "r68_holt_forecast",          # collect_list fold over 10x-longer series
    "q98_text_embedding_topk",    # per-row encoder cost (narrow map)
    "z18_exact_substring_dedup",  # overlapping-gram dedup on dup-heavy 10x
    "z19_exact_substring_hashed", # same plan, xxhash64 shuffle-1 keys
    "z20_curation_pipeline_esd",  # full curation chain incl. ESD stage
    "z21_multimodal_quarantine",  # per-row strict decode + enforce split
    "z23_cdc_chunk_dedup",        # gear-CDC chunker: narrow per-row CPU + one count window
    "z24_streaming_chunk_ingest", # online chunk-index ingest: 3 micro-batches + txlog commits
    "z25_chunkstore_lifecycle",   # content-addressed store: put + delete + gc + reconstruct
    "z26_wav_audio_features",     # per-row RIFF parse + PCM decode (narrow map)
    "z27_wav_quarantine",         # per-row strict parse + enforce split
    "z29_streaming_exactsubstr_ingest",  # online gram-index ingest on dup-heavy 10x
    "z30_streaming_minhash_ingest",      # online LSH dedup ingest on dup-heavy 10x
    "z32_streaming_minhash_resolved",    # order-independent resolved ingest (round 8)
    "z34_streaming_curation_maintained", # curation w/ live maintenance cadence (round 8)
    "z39_streaming_exactsubstr_maintained",  # gram-index maintenance cadence (round 9)
    "z40_streaming_chunk_maintained",        # chunk-store maintenance cadence (round 9)
    "z41_streaming_simhash_maintained",      # resolved-SimHash maintenance cadence (round 9)
    "z42_streaming_curated_shard_packing",   # maintained drain -> shard packing (round 9)
]

#: key column to offset per table so replicas don't collide
OFFSETS = {
    "lineitem": [("l_orderkey", 10_000_000)],
    "orders": [("o_orderkey", 10_000_000)],
    "events": [("event_id", 10_000_000)],
    "documents": [("doc_id", 10_000_000)],
    "embeddings": [("vec_id", 10_000_000)],
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build(spark, dst: str, copies: int) -> None:
    """Replicate SRC ``copies`` times into ``dst``. A replica-index
    cross join (not a ``copies``-way union: a 100-branch union plan
    analyzes slowly and buys nothing) + key offsets + the documents
    text-tail mutation."""
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    reps = F.explode(
        F.array(*[F.lit(k) for k in range(copies)])
    ).alias("__k")
    for tbl in TABLES:
        src = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        if tbl not in OFFSETS:  # tiny dims: copy as-is
            src.write.parquet(f"{dst}/{tbl}.parquet")
            continue
        d = src.select("*", reps)
        for col, step in OFFSETS[tbl]:
            d = d.withColumn(
                col, F.col(col) + F.col("__k").cast("long") * F.lit(step)
            )
        if tbl == "documents" and "text" in d.columns:
            # mutate the tail so replicas are near- not exact dups
            d = d.withColumn(
                "text",
                F.concat_ws(
                    " ", "text", F.concat(F.lit("rep"), F.col("__k"))
                ),
            )
        d.drop("__k").repartition(32).write.parquet(f"{dst}/{tbl}.parquet")


def timeq(spark, name: str, sf_dir: str, passes: int = 2) -> float:
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    return round(best, 3)


def main() -> None:
    args = sys.argv[1:]
    copies, passes = COPIES, 2
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
        if copies != COPIES:
            passes = 1  # minutes-long queries: min-of-2 buys noise, not truth
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    dst = DST if copies == COPIES else f"/tmp/sf{copies // 10}_probe"
    spark = get_spark(
        app_name="scaling-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        build(spark, dst, copies)
    # warm-up
    timeq(spark, "q01_pricing_summary", SRC, passes=1)
    names = args or QUERIES
    big_key = f"sf{copies / 10:g}_s"
    report = {}
    for name in names:
        small = timeq(spark, name, SRC, passes=passes)
        big = timeq(spark, name, dst, passes=passes)
        report[name] = {
            "sf0.1_s": small,
            big_key: big,
            "ratio": round(big / small, 2) if small else None,
        }
        print(json.dumps({name: report[name]}), flush=True)
    total_small = round(sum(r["sf0.1_s"] for r in report.values()), 2)
    total_big = round(sum(r[big_key] for r in report.values()), 2)
    print(
        json.dumps(
            {
                "total_sf0.1_s": total_small,
                f"total_{big_key}": total_big,
                f"ratio_at_{copies}x_data": round(total_big / total_small, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
