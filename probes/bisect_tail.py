"""Bisect probe for the round-8 ESD/txlog bench-family regression.

Observation (BENCH_r07 vs BENCH_r08): the queries that regressed
(+8..21%) are EXACTLY the last nine HEADLINE positions (z18..z29),
across unrelated code families (ESD, codec quarantine, CDC chunks,
chunkstore lifecycle, streaming ingest), while positions 1-30 ran
flat-or-faster on the same host. That is a positional signature, not
a code signature -- suspect: intra-session state accumulation
(CacheManager entries / localCheckpoint blocks / txlog scratch /
old-gen heap growth in the single 8 GB local-mode JVM), amplified by
round 8's extra full-warm pass (tail queries now execute with ~39
more prior query executions in the session than under the round-7
protocol).

Modes (one fresh process each -- run via the shell wrapper):
  isolated  warm FAMILY only, then 2 measured passes over FAMILY.
  tail      full r8 protocol (warm all 39, 2 measured passes over
            all 39), report FAMILY + CONTROLS.
  tail_gc   same as tail but clearCache() + gc.collect() between
            passes -- tests the mitigation.

All walls are printed with the python-loop host-calibration anchor so
cross-run comparisons can divide out CPU steal.
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.workload import REGISTRY  # noqa: E402
from bench import HEADLINE, _host_calibration  # noqa: E402

FAMILY = [
    "z18_exact_substring_dedup",
    "z19_exact_substring_hashed",
    "z20_curation_pipeline_esd",
    "z29_streaming_exactsubstr_ingest",
]
CONTROLS = ["q18_user_event_deltas", "q33_neardup_shingle_jaccard"]
PASSES = 2


def _execute(spark, name, sf_dir):
    t0 = time.perf_counter()
    REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    mode = sys.argv[1]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name=f"bisect-{mode}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm = FAMILY + CONTROLS if mode == "isolated" else HEADLINE
    run = FAMILY + CONTROLS if mode == "isolated" else HEADLINE
    for name in warm:
        _execute(spark, name, sf_dir)

    cal0 = _host_calibration()
    timings: dict[str, float] = {}
    for _ in range(PASSES):
        if mode == "tail_gc":
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        for name in run:
            w = _execute(spark, name, sf_dir)
            timings[name] = min(timings.get(name, w), w)
    cal1 = _host_calibration()

    out = {
        "mode": mode,
        "family": {n: timings[n] for n in FAMILY},
        "controls": {n: timings[n] for n in CONTROLS},
        "family_total": round(sum(timings[n] for n in FAMILY), 3),
        "loop_sec": min(cal0["python_loop_sec"], cal1["python_loop_sec"]),
        "gemm_sec": min(cal0["numpy_gemm_sec"], cal1["numpy_gemm_sec"]),
    }
    print("BISECT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
