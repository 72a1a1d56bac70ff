"""Recorded oracle-parity sweep: run EVERY oracle-backed registry
query against its DuckDB twin at a chosen scale factor and write the
per-query result to ``PARITY_sf{X}.json`` — the committed, repeatable
artifact of the local correctness gate at a scale the driver's
50-entry CORRECTNESS window doesn't reach (round-3 verdict task 3).

Usage::

    python gen_parity.py [sf_dir]          # default /root/testdata/sf0.1

Rows-only queries (no SQL oracle by design) are executed for shape
(runs, ≥0 rows) and recorded as ``rows_only``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.workload import REGISTRY  # noqa: E402
from oracle_utils import compare, run_oracle  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    spark = get_spark(
        app_name="eeg-data-lake-parity",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name, e in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        try:
            df = e.spark_fn(spark, sf_dir)
            if e.oracle:
                problems = compare(df, run_oracle(e.oracle, sf_dir), name)
                ok = not problems
                n_pass += ok
                n_fail += not ok
                results[name] = {
                    "mode": "oracle",
                    "match": ok,
                    "problems": problems[:3],
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            else:
                n = df.count()
                n_rows_only += 1
                results[name] = {
                    "mode": "rows_only",
                    "rows": n,
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
        except Exception as exc:  # record, keep sweeping
            n_fail += 1
            results[name] = {"mode": "error", "error": str(exc)[:300]}
        mode = results[name].get("mode")
        if mode == "error":
            status = "ERROR"
        else:
            status = "OK" if results[name].get("match", True) else "MISMATCH"
        print(f"{name}: {mode} {status}", flush=True)

    out = {
        "sf_dir": sf_dir,
        "oracle_pass": n_pass,
        "oracle_fail": n_fail,
        "rows_only": n_rows_only,
        "total": len(results),
        "results": results,
    }
    path = Path(__file__).resolve().parent / f"PARITY_{sf_tag}.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(
        f"\nPARITY {sf_tag}: {n_pass} oracle-pass, {n_fail} fail, "
        f"{n_rows_only} rows-only -> {path}"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
