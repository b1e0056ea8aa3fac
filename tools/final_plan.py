"""Run a registered query through the noop sink and print the FINAL
(post-AQE) physical plan plus execution metrics, from the SQL status store.

Usage: python tools/final_plan.py [--sf DIR] query [query ...]

explain() only shows the initial plan (AdaptiveSparkPlan isFinalPlan=false);
reused exchanges, AQE coalescing/skew splits, and runtime join rewrites are
only visible in the executed plan.  This pulls the driver-UI plan
description for the execution after it completes — the honest evidence for
"N Exchange" / "ReusedExchange" claims.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from oltp_to_data_warehouse_pipeline_spark.plans.queryset import registry  # noqa: E402
from oltp_to_data_warehouse_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]

    spark = get_spark("final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    store = spark._jsparkSession.sharedState().statusStore()

    for name in args:
        df = queries[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"final_plan:{name}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        # the noop write is the most recent execution in the store
        time.sleep(0.3)
        execs = store.executionsList()
        last = execs.apply(execs.size() - 1)
        desc = last.physicalPlanDescription()
        print(f"===== {name} (wall {wall:.2f}s, executionId {last.executionId()}) =====")
        print(desc)


if __name__ == "__main__":
    main()
