"""Two-decade scaling study for the three worst round-6 10x scalers
(round-6 verdict item 4): time doc_winnowing_fingerprints,
embedding_near_dup_lsh and embedding_quantize_int8 at 1x (sf0.1), 10x
(/tmp/scale_sf1) and 100x (/tmp/scale_sf10, corpus tables only) and print
the per-decade wall ratios plus the stage-level shuffle evidence.

The claim under test: these queries' super-unit 10x ratios are CPU
saturation of idle cores (embarrassingly parallel work filling local[32]),
NOT shuffle growth — so the second decade, where the cores are already
saturated, must come in at <= ~10x per 10x data (data-proportional), and
the shuffle-bytes-per-input-row must stay flat.

Protocol matches bench.py: noop sink, min-of-k wall per scale, persisted
intermediates dropped between runs; shuffle volume read from the
lineage-scoped Spark status API for one representative run.

Usage: python tools/scale_decades.py [k]   (default min-of-3)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/scale_sf1"),
    ("100x", "/tmp/scale_sf10"),
]
QUERIES = [
    "doc_winnowing_fingerprints",
    "embedding_near_dup_lsh",
    "embedding_quantize_int8",
]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from oltp_to_data_warehouse_pipeline_spark.plans.queryset import registry
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("scale-decades")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    def drop_persisted() -> None:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    def run(name: str, sf_dir: str) -> None:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def shuffle_stats(name: str, sf_dir: str) -> dict:
        """Shuffle bytes + records for ONE run, via per-job stage metrics.
        The job group is unique per (query, scale) — reusing one group
        across scales made later decades' sums include earlier decades'
        stages (round-7 review finding)."""
        sc = spark.sparkContext
        tracker = sc.statusTracker()
        group = f"decade-{name}-{sf_dir.replace('/', '_')}"
        before = set(tracker.getJobIdsForGroup(group) or [])
        sc.setJobGroup(group, name)
        run(name, sf_dir)
        sc.setJobGroup(None, None)
        jobs = [j for j in (tracker.getJobIdsForGroup(group) or []) if j not in before]
        store = sc._jsc.sc().statusStore()
        sw = sr = 0
        stage_ids = set()
        for j in jobs:
            jd = tracker.getJobInfo(j)
            if jd:
                stage_ids.update(jd.stageIds)
        for sid in stage_ids:
            try:
                s = store.lastStageAttempt(sid)
                sw += s.shuffleWriteBytes()
                sr += s.shuffleReadBytes()
            except Exception:
                pass
        return {"shuffle_write_mb": round(sw / 1e6, 1), "shuffle_read_mb": round(sr / 1e6, 1)}

    out: dict = {}
    for name in QUERIES:
        out[name] = {}
        run(name, SCALES[0][1])  # warm: codegen etc.
        drop_persisted()
        for label, sf_dir in SCALES:
            best = float("inf")
            for _ in range(k):
                t0 = time.time()
                run(name, sf_dir)
                best = min(best, time.time() - t0)
                drop_persisted()
            stats = shuffle_stats(name, sf_dir)
            drop_persisted()
            out[name][label] = {"sec": round(best, 2), **stats}
        r10 = out[name]["10x"]["sec"] / out[name]["1x"]["sec"]
        r100 = out[name]["100x"]["sec"] / out[name]["10x"]["sec"]
        out[name]["decade_ratios"] = {"1x->10x": round(r10, 2), "10x->100x": round(r100, 2)}
        print(json.dumps({name: out[name]}), flush=True)

    Path("SCALE_DECADES.json").write_text(json.dumps(out, indent=2) + "\n")
    print("wrote SCALE_DECADES.json")


if __name__ == "__main__":
    main()
