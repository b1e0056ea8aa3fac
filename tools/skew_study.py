"""Adversarial skew study (round-6 verdict item 5): a deliberately
Zipf-skewed join-key fixture — ONE part carries ~30% of a 10x lineitem —
and a measured unsalted-vs-salted pair for the shuffled-hash brand-revenue
join (min-of-k walls; the salted plan's fan-out itself is pinned by
tests/test_skew.py::test_salted_plan_shuffles_on_key_and_salt).

Why this regime is the adversarial one: the hot key's ~1.8M rows land in a
single shuffle partition.  AQE's skew-join splitting (on, per session.py)
only fires past `skewedPartitionThresholdInBytes` (256 MB default); a
30%-hot partition at this scale is tens of MB — real skew, but UNDER the
runtime-rescue threshold, which is exactly when explicit salting is the
only fix.  At 100 TB the same key blows past the threshold and AQE splits
SMJ/SHJ partitions too; salting stays the deterministic answer when the
skew sits under AQE's radar or in operators AQE cannot split.

Builds /tmp/skew_fixture (lineitem with remapped l_partkey + the part
table), measures min-of-k for both plans, prints one JSON line each, and
writes SKEW_STUDY.json.

Usage: python tools/skew_study.py [k] (default min-of-3)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/tmp/scale_sf1"  # 10x fixture (tools/make_scale_fixture.py)
OUT = "/tmp/skew_fixture"
HOT_SHARE = 0.3


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from oltp_to_data_warehouse_pipeline_spark.operators.skew import salted_join
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("skew-study")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        li = load_table(spark, SRC, "lineitem")
        hot = load_table(spark, SRC, "part").select(F.min("p_partkey")).collect()[0][0]
        # deterministic 30% of rows get the hot part key
        li = li.withColumn(
            "l_partkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < int(HOT_SHARE * 10),
                F.lit(hot),
            ).otherwise(F.col("l_partkey")),
        )
        li.write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")
        load_table(spark, SRC, "part").write.mode("overwrite").parquet(f"{OUT}/part.parquet")
        print(f"fixture: hot part {hot} takes {HOT_SHARE:.0%} of lineitem", flush=True)

    li = load_table(spark, OUT, "lineitem").select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, OUT, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (1 - F.col("l_discount").cast("decimal(8,4)")))

    def agg(joined):
        return joined.groupBy("p_brand").agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )

    # Both sides run under the SAME session confs (AQE + skewJoin ON) and
    # the SAME shuffle_hash hint: salting is the only variable.  The hint
    # mirrors the operator's broadcast-infeasible premise — at 100 TB the
    # dimension doesn't broadcast; letting the baseline broadcast 20k parts
    # would measure broadcast-vs-salt, not skew.
    plans = {
        "unsalted_shj": lambda: agg(li.join(part.hint("shuffle_hash"), "l_partkey")),
        "salted_8": lambda: agg(salted_join(li, part, on="l_partkey", salts=8)),
        "salted_32": lambda: agg(salted_join(li, part, on="l_partkey", salts=32)),
    }

    def drop_persisted() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    out: dict = {}
    # parity first: salting must not change a row
    base = {tuple(r) for r in plans["unsalted_shj"]().collect()}
    for name in ("salted_8", "salted_32"):
        assert {tuple(r) for r in plans[name]().collect()} == base, f"{name} diverged!"
    out["parity"] = f"ok ({len(base)} brands)"

    for name, build in plans.items():
        build().write.format("noop").mode("overwrite").save()  # warm
        drop_persisted()
        best = float("inf")
        for _ in range(k):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            drop_persisted()
        out[name] = {"sec": round(best, 2)}
        print(json.dumps({name: out[name]}), flush=True)

    out["speedup_8"] = round(out["unsalted_shj"]["sec"] / out["salted_8"]["sec"], 2)
    out["speedup_32"] = round(out["unsalted_shj"]["sec"] / out["salted_32"]["sec"], 2)
    Path("SKEW_STUDY.json").write_text(json.dumps(out, indent=2) + "\n")
    print("wrote SKEW_STUDY.json")


if __name__ == "__main__":
    main()
