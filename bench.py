"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf", ...}.

Each query is forced with the noop sink (full computation, no driver
collect), which is the honest way to time a distributed plan.

The DuckDB oracle twins are timed IN THE SAME INVOCATION with the SAME
estimator (min-of-5 per query for BOTH engines; the >=5s early stop only
fires after two timed samples, for both engines alike — an asymmetric
min-of-5-vs-min-of-2 would bias the ratio toward whichever engine gets
more samples on a host with ±12% load noise): this shared host's load
shifts totals between invocations (round-4 forensics), so a ratio against
a historically-recorded oracle run answers "how was the host feeling that
day", not "is the engine fast".  Measuring both engines back-to-back makes
the ratio robust by construction.  Set SPARK_GRAFT_SKIP_ORACLE=1 to skip
the DuckDB side (Spark-only timing).

Output contract: the driver captures only the LAST ~2000 CHARS of stdout
and parses the JSON line out of that window (round-5 forensics: a 4.5 KB
line with embedded per-query oracle timings came back "parsed": null), so
stdout carries ONE COMPACT line — metric/value/unit/queries/sf, the
oracle_total and ratio scalars, and the round-12 contamination markers
("ctl": control-query wall, star_join_revenue, quiet-host baseline
~0.61 s; "lav": [start, end] 1-min loadavg) — and the full per-query
oracle timings, per-query ratios, and loadavg stamp go to
BENCH_DETAIL.json next to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "pricing_summary",
    "star_join_revenue",
    "monthly_trend",
    "revenue_rollup",
    "top_revenue_customers",
    "dedup_exact",
    "latest_event_per_user",
    "cleaning_pipeline",
    "dim_date_build",
    "transaction_dim_build",
    "hourly_events",
    "json_flatten_events",
    "doc_token_stats",
    "lang_id",
    "minhash_lsh_candidates",
    # ngram_jaccard_pairs rotated out round 10 for doc_lm_perplexity: the
    # set-similarity family stays covered by minhash_lsh_candidates +
    # prefix_filter_near_pairs; remains oracle-gated
    "cosine_topk",
    # round 11 adds sharded_near_dup beside embedding_near_dup_lsh (the
    # optimization-round contract is additive: entries recorded in the
    # driver's BENCH_r10.json are never removed or renamed)
    "embedding_near_dup_lsh",
    "sharded_near_dup",
    "doc_winnowing_fingerprints",
    "curate_corpus",
    "doc_pii_scrub",
    "doc_chunk_spans",
    "doc_char_entropy",
    "embedding_quantize_int8",
    "corpus_vocab_stats",
    "cosine_topk_rerank",
    "doc_idf_rarity",
    "doc_ngram_novelty",
    "brand_affinity_lift",
    "token_shard_assign",
    "event_value_outliers_mad",
    # round-3 additions: the queries whose oracles carried the HUGEINT /
    # -0.0 canon hazards — timed here so their numbers exist whichever 50
    # the driver's rotating correctness sample draws
    "token_budget_pack",
    "corpus_lang_stats",
    "corpus_mixture_sample",
    "dedup_yield_report",
    "linestatus_priority_split",
    "embedding_components",
    "user_activity_entropy",
    # round-3 new operators
    "bm25_search_topk",
    "chunk_dedup_reassemble",
    # round-11 additions (contamination_spans restored by the additive
    # contract above; the stdout line budget is re-derived in
    # test_bench_contract from the all-time per-query maxima, with the
    # runtime trim loop below as the pathological-host backstop)
    "contamination_spans",
    "sequence_packing_plan",
    "corpus_epoch_shuffle",
    # round-5 new operators
    "session_funnel_depth",
    # round-6 new operators
    "bloom_pruned_order_revenue",
    "orders_zorder_locality",
    "heavy_hitter_users",
    "trending_event_types",
    "order_value_bootstrap_ci",
    # round-7 new operators.  The benched KMV variants are the
    # sketch-only paths (what ships at 100 TB); their audited twins
    # (kmv_daily_users, kmv_cohort_overlap) stay oracle-gated in the
    # correctness registry — the audit half re-aggregates raw rows per
    # window by design and is a verification artifact, not the operator
    # (VERDICT r7 item 2).
    "session_concurrency_peaks",
    "prefix_filter_near_pairs",
    "kmv_cohort_overlap_sketch",
    "orders_compaction_plan",
    "daily_revenue_interpolated",
    # round-8 additions: the clustering/graph/ANN operators that were
    # registry-only — an LLM-data engine's dedup story ends in CLUSTERS,
    # not pairs, so the end-to-end semantic/lexical dedup paths and the
    # iterative pagerank belong in the headline set (round-8 profiling
    # also fixed semantic_dedup_clusters 46.8s -> 5.9s; benching it keeps
    # that class of regression visible).
    "semantic_dedup_clusters",
    "near_dup_clusters",
    "brand_pagerank",
    "embedding_near_dup_auto",
    # round-8b additions: span-grain exact substring dedup and the
    # mergeable quantile sketch (sketch-only path benched; the audited
    # twin qsketch_price_quantiles stays oracle-gated — same split as the
    # KMV variants above).
    "dup_span_pairs",
    "dup_span_excision",
    "qsketch_price_quantiles_sketch",
    # round 9 (kmv_daily_users_sketch / zorder_skipping_gain /
    # simhash_fingerprints rotated out: their families stay covered by
    # kmv_cohort_overlap_sketch / orders_zorder_locality /
    # minhash_lsh_candidates, and the 66-name stdout line overflowed
    # the driver's 2000-char tail window — all remain oracle-gated)
    "doc_gopher_rep_fracs",
    "priority_weighted_sample",
    "hll_daily_users",
    # round 10: corpus-trained bigram-LM perplexity (CCNet-style)
    "doc_lm_perplexity",
]


def main() -> None:
    # stdout contract: EXACTLY one JSON line.  The JVM writes banners to
    # fd 1 under some timings (observed under heavy host load), so fd 1 is
    # redirected into stderr for the whole run and the JSON goes to a saved
    # dup of the original stdout at the end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from oltp_to_data_warehouse_pipeline_spark.plans.queryset import registry
    from oltp_to_data_warehouse_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    # Per-query warmup at the smallest scale factor: whole-stage codegen and
    # JIT compile against the identical plan shape (the codegen cache is
    # keyed by generated source, which doesn't depend on the input path), so
    # the timed sf runs below measure data-proportional compute instead of
    # first-run compilation.  Falls back to the bench dir when sf0.001
    # doesn't exist.
    def drop_persisted() -> None:
        # operators materialize small intermediates via localCheckpoint;
        # release them between queries so one query's blocks don't pressure
        # the next query's execution memory
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        # DataFrame-level persist() entries live in the CacheManager, not
        # the RDD registry — clear those too so every timed sample pays the
        # full materialization cost (honest timings for queries that cache
        # a multi-consumer relation)
        spark.catalog.clearCache()
        # full collection outside the timed window: keeps one query's garbage
        # from billing a GC pause to the next query's timing
        spark.sparkContext._jvm.System.gc()

    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        queries[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        drop_persisted()

    # Five timed runs per query, keep the minimum: this host shares CPU
    # with other tenants (load spikes up to ~6 with zero local JVMs), and a
    # single sample can inflate a 2s query to 5s — with two samples the
    # heavy text queries still drifted ~2x between whole-bench invocations.
    # The min of k samples is the standard interference-suppressing
    # estimator for wall-clock microbenchmarks.  k=5 after the round-3
    # "regression cluster" on sub-second queries proved to be sampling
    # noise: a controlled n=5 A/B of the AQE coalesce floor (64 KiB vs
    # 1 MiB) showed <6% difference on every flagged query, while min-of-3
    # round-over-round deltas had shown 30-80%.
    load_start = os.getloadavg()

    def min_of_k(run, between=None, k: int = 5, early_stop: float = 5.0) -> float:
        """Shared estimator for BOTH engines: min of k timed runs, with an
        early stop for pathological queries — but only after at least two
        samples, so one load spike can't latch a slow time (advisor
        round-5 finding: the stop must be symmetric and never fire on the
        first sample).  ``between`` runs after each sample OUTSIDE the
        timed window (cache/GC cleanup is not billed to the query)."""
        best = float("inf")
        for i in range(k):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
            if between is not None:
                between()
            if i >= 1 and best >= early_stop:
                break
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        # One untimed warm run at the TARGET sf, mirroring the untimed
        # warm-up the DuckDB side gets before its min-of-5 — without it
        # Spark's min-of-5 includes its cold first run (parquet footers,
        # codegen) while DuckDB's does not, and the estimator is not
        # literally symmetric (advisor r6 finding; the sf0.001 warm pass
        # above covers compilation but not this sf's file metadata).
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        drop_persisted()
        timings[name] = min_of_k(
            lambda fn=fn: fn(spark, sf_dir).write.format("noop").mode("overwrite").save(),
            between=drop_persisted,
        )
    # total = query time only; the inter-query cleanup (unpersist + forced
    # GC) is deliberately outside the bill — it exists to keep one query's
    # garbage from distorting the next query's measurement
    total = round(sum(timings.values()), 3)

    out: dict = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Same-session DuckDB yardstick (module docstring): warm + the SAME
    # min-of-5 estimator as the Spark side, including the symmetric >=5s
    # early stop (DuckDB's doc_winnowing twin runs ~40 s at sf0.1 — after
    # two samples of a multi-second query the min already dominates
    # scheduler noise).
    detail: dict = {}
    if os.environ.get("SPARK_GRAFT_SKIP_ORACLE") != "1":
        sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
        from _common import connect_views

        from oltp_to_data_warehouse_pipeline_spark.plans.queryset import (
            registry as _reg,
        )

        _, oracles = _reg()
        con = connect_views(sf_dir)
        oracle_timings: dict[str, float] = {}
        for name in HEADLINE:
            sql = oracles.get(name)
            if sql is None:
                continue
            con.execute(sql).fetchall()  # warm: parquet metadata, JIT
            oracle_timings[name] = min_of_k(lambda sql=sql: con.execute(sql).fetchall())
        shared = [n for n in timings if n in oracle_timings]
        sp_total = sum(timings[n] for n in shared)
        or_total = sum(oracle_timings[n] for n in shared)
        out["oracle_total"] = round(or_total, 3)
        out["ratio"] = round(sp_total / or_total, 3) if or_total else None
        detail["oracle"] = oracle_timings
        detail["ratio_queries"] = {
            n: round(timings[n] / oracle_timings[n], 2) if oracle_timings[n] else None
            for n in shared
        }
    load_end = os.getloadavg()
    # Contamination markers ON THE STDOUT LINE (round-11 verdict item 2):
    # both r11 driver windows failed the repo's control-query gate
    # (star_join_revenue 1.84x its 0.61s quiet-host baseline with an
    # untouched plan), but the evidence lived only in BENCH_DETAIL.json,
    # which the driver never reads.  Two compact additive keys make a
    # load-contaminated window detectable from BENCH_r{N}.json alone:
    #   "ctl" — the CONTROL query's wall (star_join_revenue: 1 fact scan +
    #           3 broadcast dims, plan untouched since round 1; quiet-host
    #           baseline ~0.61 s at sf0.1 on 32 cores).  ctl > ~1.2x that
    #           baseline means external load inflated the window and
    #           per-query walls are not comparable to a quiet window.
    #   "lav" — [1-min loadavg at bench start, at bench end]; this host
    #           idles ~1-3 with only the bench running, so values near or
    #           past 10 mark external-tenant bursts (round-11 forensics).
    # Short names are budget-driven: the driver parses the JSON line out
    # of a ~2000-char stdout tail, and the named-key spelling pushed the
    # realistic 65-query line past the 1900-char budget, which would trim
    # query entries (worse than terse scalars).
    out["ctl"] = timings.get("star_join_revenue")
    out["lav"] = [round(load_start[0], 1), round(load_end[0], 1)]
    detail["loadavg"] = {"start": load_start, "end": load_end}

    # Full record (per-query oracle timings, ratios, loadavg) → file; the
    # stdout line must fit the driver's 2000-char tail window.
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps({**out, **detail}, indent=2) + "\n")

    # stdout carries per-query timings at 2dp — the 63-name headline set
    # at 3dp would brush the driver's 2000-char tail window (the contract
    # test's worst case); BENCH_DETAIL.json above keeps the full 3dp.
    # Mutate out AFTER the detail write so the trim loop below also
    # operates on 2dp values (a throwaway rounded copy here would revert
    # the line to 3dp the moment trimming engages — review finding).
    # Values >= 10 s drop to 1dp (4 chars, same as 2dp sub-10s values):
    # on a pathologically loaded host ANY number of queries can cross 10 s
    # without widening the line, so the trim loop stays a dead backstop
    # instead of silently shedding entries (round-11 advisor finding).
    out["queries"] = {
        n: round(t, 2) if t < 10 else round(t, 1) for n, t in timings.items()
    }
    if out.get("ctl") is not None:
        out["ctl"] = round(out["ctl"], 2)  # 3dp stays in BENCH_DETAIL
    line = json.dumps(out, separators=(",", ":"))
    # Last-resort trim: the dominant line cost is the per-query dict, not
    # the ~45-char scalars — dropping scalars alone could never bring an
    # over-budget line back under the window (round-6 review finding).
    # Shed the FASTEST query entries first (full dict lives in
    # BENCH_DETAIL.json; the slow entries are the informative ones) and
    # keep the contract keys and ratio scalars.
    while len(line) > 1900 and len(out["queries"]) > 8:
        out["queries"].pop(min(out["queries"], key=out["queries"].get))
        out["queries_trimmed"] = True
        line = json.dumps(out, separators=(",", ":"))
    os.write(real_stdout, (line + "\n").encode())


if __name__ == "__main__":
    main()
