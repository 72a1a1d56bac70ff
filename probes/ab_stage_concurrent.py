"""Same-session serpentine A/B of the round-11 concurrent job staging
(txpair stage_concurrently + chunkstore put/gc overlap) for z29, z25
and z20 (control — z20 has no txlog path, so it should read ~1.0):
alternate SPARK_GRAFT_STAGE_CONCURRENT=off (serial job order — the
round-10 shape; both txpair and chunkstore honor the gate) and =auto
(overlapped data writes) inside ONE session, min over rounds, so the
claim survives this host's ±25 % steal."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.workload import REGISTRY  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 3
QUERIES = [
    "z29_streaming_exactsubstr_ingest",
    "z25_chunkstore_lifecycle",
    "z20_curation_pipeline_esd",
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run(spark, name):
    t0 = time.perf_counter()
    _noop(REGISTRY[name].spark_fn(spark, SF_DIR))
    return time.perf_counter() - t0


def main():
    spark = get_spark(app_name="ab-stage-concurrent")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both variants once
    for mode in ("off", "auto"):
        os.environ["SPARK_GRAFT_STAGE_CONCURRENT"] = mode
        for q in QUERIES:
            run(spark, q)
    best: dict[tuple[str, str], float] = {}
    for r in range(ROUNDS):
        order = ("off", "auto") if r % 2 == 0 else ("auto", "off")
        for mode in order:
            os.environ["SPARK_GRAFT_STAGE_CONCURRENT"] = mode
            for q in QUERIES:
                w = run(spark, q)
                k = (q, mode)
                best[k] = min(best.get(k, w), w)
                print(f"round{r} {mode:4s} {q} {w:.3f}s", flush=True)
    print("=== minima ===")
    for q in QUERIES:
        off, new = best[(q, "off")], best[(q, "auto")]
        print(f"{q}: serial={off:.3f}s concurrent={new:.3f}s ratio={new/off:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
