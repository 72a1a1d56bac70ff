"""Capture `.explain("formatted")` for a list of registered queries
into plans/r{N}/<name>_<tag>.txt (PLANS_ROUND env, default r11) — the before/after evidence files the
optimization round commits alongside the code.

Usage: python probes/capture_plans.py <tag> [name ...]
  tag   = "before" | "after"
  names = registry names; default: the bench HEADLINE set
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eeg_data_lake_spark.session import get_spark  # noqa: E402
from eeg_data_lake_spark.workload import REGISTRY  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r11")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {exc}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(name, "ok" if "FAILED" not in plan[:40] else "FAILED")
    spark.stop()


if __name__ == "__main__":
    main()
