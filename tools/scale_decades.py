"""Two-decade scaling study (round-6 verdict item 4, extended per round-7
item 4): time the operators with super-unit 10x ratios or unmeasured scale
claims at 1x (sf0.1), 10x (/tmp/scale_sf1) and 100x (/tmp/scale_sf10) and
print the per-decade wall ratios plus the stage-level shuffle evidence.

The claim under test: super-unit 10x ratios are CPU saturation of idle
cores (embarrassingly parallel work filling local[32]), NOT shuffle growth
— so the second decade, where the cores are already saturated, must come
in at <= ~10x per 10x data (data-proportional), and the
shuffle-bytes-per-input-row must stay flat.

Round-8 additions (round-7 verdict item 4): the prefix-filtered SSJoin
(plus its audit row per scale, which quantifies the claimed pair-expansion
shrink), the KMV merge rollup, the sweep-line concurrency operator, and
the auto-banded ANN path that replaced the fixed-band quadratic one.

Protocol matches bench.py: noop sink, min-of-k wall per scale, persisted
intermediates dropped between runs; shuffle volume read from the
lineage-scoped Spark status API for one representative run.

Usage: python tools/scale_decades.py [k] [only,names]
(default min-of-3, all QUERIES; 100x runs only when the fixture has the
query's tables — build them with tools/make_scale_fixture.py)

k=0 measures each scale ONCE, timing the same run that collects the
shuffle stats — the mode for the 1000x fixture, where a single run is
tens of minutes and min-of-k is unaffordable.  SCALE_DECADES_SCALES
(comma list, e.g. "100x,1000x") restricts which scales re-measure;
prior entries for unmeasured scales are KEPT and the decade ratios are
recomputed over the merged set.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/scale_sf1"),
    ("100x", "/tmp/scale_sf10"),
    # third decade (round-9 verdict item 2): only queries whose tables the
    # 1000x fixture carries (documents/embeddings) get this point — build
    # with tools/make_scale_fixture.py /tmp/scale_sf100 10 /tmp/scale_sf10
    ("1000x", "/tmp/scale_sf100"),
]
QUERIES = [
    "doc_winnowing_fingerprints",
    "embedding_near_dup_lsh",
    "embedding_quantize_int8",
    "prefix_filter_near_pairs",
    "kmv_rolling_7d_users",
    "session_concurrency_peaks",
    "embedding_near_dup_auto",
    # round-8b: span-grain substring dedup + mergeable quantile sketch
    "dup_span_pairs",
    "dup_span_excision",
    "qsketch_price_quantiles_sketch",
    "qsketch_rolling_7d_price",
    "snm_near_pairs",
    # round-9: Gopher repetition fractions (per-doc n-gram explodes),
    # priority sampling (global top-k path), HLL register build
    "doc_gopher_rep_fracs",
    "priority_weighted_sample",
    "hll_daily_users",
    "lang_priority_sample",
    "source_repetition_gate",
    # round-11: fixed-per-shard-load ANN dedup — the mitigation for the
    # unsharded auto path's rho-exponent; claim under test: shuffle growth
    # <= linear per decade at constant band count
    "sharded_near_dup",
    # round-11 (late): sample packing — claim under test: the md5-block
    # two-level window keeps shuffle linear and partitions bounded (no
    # data-sized per-stratum window anywhere)
    "sequence_packing_plan",
]
#: tables each query needs present in a fixture dir (gate for 100x)
NEEDS = {
    "doc_winnowing_fingerprints": ["documents"],
    "embedding_near_dup_lsh": ["embeddings"],
    "embedding_quantize_int8": ["embeddings"],
    "prefix_filter_near_pairs": ["documents"],
    "kmv_rolling_7d_users": ["events"],
    "session_concurrency_peaks": ["events"],
    "embedding_near_dup_auto": ["embeddings"],
    "dup_span_pairs": ["documents"],
    "dup_span_excision": ["documents"],
    "qsketch_price_quantiles_sketch": ["orders"],
    "qsketch_rolling_7d_price": ["orders"],
    "snm_near_pairs": ["documents"],
    "doc_gopher_rep_fracs": ["documents"],
    "priority_weighted_sample": ["documents"],
    "hll_daily_users": ["events"],
    "sharded_near_dup": ["embeddings"],
    "lang_priority_sample": ["documents"],
    "source_repetition_gate": ["documents"],
    "sequence_packing_plan": ["documents"],
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

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

    def has_tables(name: str, sf_dir: str) -> bool:
        return all(
            os.path.exists(f"{sf_dir}/{t}.parquet") for t in NEEDS.get(name, [])
        )

    scale_filter = os.environ.get("SCALE_DECADES_SCALES")
    measure = (
        {s.strip() for s in scale_filter.split(",")}
        if scale_filter
        else {label for label, _ in SCALES}
    )

    prior: dict = {}
    if Path("SCALE_DECADES.json").exists():  # extend, don't clobber
        prior = json.loads(Path("SCALE_DECADES.json").read_text())
    out: dict = dict(prior)
    scale_labels = {label for label, _ in SCALES}
    for name in QUERIES:
        if only is not None and name not in only:
            continue
        # keep prior per-scale entries not being re-measured this run
        out[name] = {
            lbl: v
            for lbl, v in prior.get(name, {}).items()
            if lbl in scale_labels and lbl not in measure
        }
        run(name, SCALES[0][1])  # warm: codegen etc.
        drop_persisted()
        for label, sf_dir in SCALES:
            if label not in measure:
                continue
            if not has_tables(name, sf_dir):
                print(f"skip {name}@{label}: fixture lacks {NEEDS[name]}", flush=True)
                continue
            best = float("inf")
            for _ in range(k):
                t0 = time.time()
                run(name, sf_dir)
                best = min(best, time.time() - t0)
                drop_persisted()
            t0 = time.time()
            stats = shuffle_stats(name, sf_dir)
            stats_sec = time.time() - t0
            if k == 0:
                # k=0 mode: the instrumented stats run IS the measurement
                # (used at 1000x where one run is 10-30 min).  For k>=1,
                # keep the recorded 'sec' strictly min-of-k CLEAN runs so
                # entries stay methodology-comparable with prior rounds
                # (advisor r10: folding the stats run into the min would
                # silently change min-of-k to min-of-(k+1 incl. an
                # instrumented run)).
                best = min(best, stats_sec)
            drop_persisted()
            out[name][label] = {"sec": round(best, 2), **stats}
        ratios = {}
        for lo, hi in (("1x", "10x"), ("10x", "100x"), ("100x", "1000x")):
            if lo in out[name] and hi in out[name]:
                ratios[f"{lo}->{hi}"] = round(
                    out[name][hi]["sec"] / out[name][lo]["sec"], 2
                )
        out[name]["decade_ratios"] = ratios
        # the prefix filter's headline claim is the PAIR-EXPANSION shrink;
        # record the audit row (postings with/without prefix, candidates,
        # survivors) per scale so the claim is measured, not asserted
        if name == "prefix_filter_near_pairs":
            for label, sf_dir in SCALES:
                if not has_tables(name, sf_dir):
                    continue
                row = queries["prefix_filter_audit"](spark, sf_dir).first()
                drop_persisted()
                pa, pp = row["postings_all"], row["postings_prefix"]
                out[name].setdefault("audit", {})[label] = {
                    "postings_all": pa,
                    "postings_prefix": pp,
                    "n_candidates": row["n_candidates"],
                    "n_pairs": row["n_pairs"],
                    # pair expansion scales ~ (postings)^2 per shingle bucket
                    "expansion_shrink_proxy": round((pa / pp) ** 2, 1) if pp else None,
                }
        print(json.dumps({name: out[name]}), flush=True)
        # incremental flush: a wedged later query must not lose the
        # measurements already taken (round-10 lesson: the 1000x point
        # can GC-wedge an undersized heap for an hour)
        Path("SCALE_DECADES.json").write_text(json.dumps(out, indent=2) + "\n")

    Path("SCALE_DECADES.json").write_text(json.dumps(out, indent=2) + "\n")
    print("wrote SCALE_DECADES.json")


if __name__ == "__main__":
    main()
