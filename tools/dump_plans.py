"""Dump .explain("formatted") for headline queries to plans/r<N>/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: "before" or "after" -> plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt
  (round dir defaults to r12; override with SPARK_GRAFT_PLANS_ROUND)
  with no query names, dumps every bench.HEADLINE entry.

Plans are captured at sf0.1 (the bench scale) with the engine's own
session confs — the same plan the bench times.  Capture is pre-execution
(AdaptiveSparkPlan isFinalPlan=false), which is what explain() gives
without running the job; Exchange counts / join strategies / PushedFilters
are all visible at this stage.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from oltp_to_data_warehouse_pipeline_spark.plans.queryset import registry  # noqa: E402
from oltp_to_data_warehouse_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    )
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange-mentions, "
              f"{len(plan.splitlines())} lines")


if __name__ == "__main__":
    main()
