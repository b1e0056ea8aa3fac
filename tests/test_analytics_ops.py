"""New analytics/LLM ops: int8 re-rank ANN, IDF rarity, n-gram novelty,
retention cohorts, event funnel (plans/queryset.py round-2 additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import similarity
from oltp_to_data_warehouse_pipeline_spark.plans import queryset
from tests.conftest import SF_DIR


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0]),
        (5, [0.0, 0.0, 0.0]),  # zero vector: coarse score must not NaN
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_rerank_full_probe_equals_exact(spark):
    """m >= |store| degrades two-stage retrieval to exact search."""
    emb = _emb(spark).where("vec_id < 5")
    q = emb.where("vec_id = 0")
    exact = similarity.cosine_topk(emb, q, k=4).collect()
    rerank = similarity.cosine_topk_rerank(emb, q, k=4, m=100).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, rerank), key=lambda t: t) == sorted(map(tuple, exact), key=lambda t: t)
    assert [r["neighbor_id"] for r in sorted(rerank, key=key)] == [1, 4, 2, 3]


def test_rerank_zero_vector_ranks_last(spark):
    emb = _emb(spark)
    q = emb.where("vec_id = 0")
    out = similarity.cosine_topk_rerank(emb, q, k=5, m=100)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    # the all-zero vector survives the coarse stage (m covers the store) but
    # its exact cosine is NULL (0/0) -> NULLS LAST in the desc sim ordering
    assert rows[-1]["neighbor_id"] == 5


def test_rerank_coarse_prune_keeps_top1(spark):
    """A tiny m still retrieves the overwhelming nearest neighbor."""
    emb = _emb(spark).where("vec_id < 5")
    q = emb.where("vec_id = 0")
    out = similarity.cosine_topk_rerank(emb, q, k=1, m=2).collect()
    assert len(out) == 1 and out[0]["neighbor_id"] == 1


def test_event_funnel_monotone(spark):
    rows = queryset.QUERIES["event_funnel"](spark, SF_DIR).collect()
    by_idx = {r["stage_idx"]: r for r in rows}
    assert set(by_idx) == {1, 2, 3}
    assert by_idx[1]["n_users"] >= by_idx[2]["n_users"] >= by_idx[3]["n_users"]
    assert by_idx[1]["conversion"] == 1.0
    assert all(0.0 <= r["conversion"] <= 1.0 for r in rows)


def test_funnel_respects_event_order(spark):
    """A purchase BEFORE the first view must not convert."""
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "purchase", 1.0, "{}"),
            (2, "2024-01-01 11:00:00", 1, "view", 1.0, "{}"),
            (3, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
            (4, "2024-01-01 11:00:00", 2, "click", 1.0, "{}"),
            (5, "2024-01-01 12:00:00", 2, "purchase", 1.0, "{}"),
        ],
        "event_id: long, ts: string, user_id: long, event_type: string, value: double, props: string",
    ).withColumn("ts", F.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        rows = queryset.QUERIES["event_funnel"](spark, d).collect()
    by_idx = {r["stage_idx"]: r for r in rows}
    assert by_idx[1]["n_users"] == 2  # both users viewed
    assert by_idx[2]["n_users"] == 1  # only user 2 clicked after viewing
    assert by_idx[3]["n_users"] == 1  # only user 2 purchased after clicking


def test_retention_cohorts_shape(spark):
    rows = queryset.QUERIES["user_retention_cohorts"](spark, SF_DIR).collect()
    assert rows, "fixture events must produce at least one cohort"
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0.0 < r["retention"] <= 1.0
    # offset 0 is the cohort itself: retention exactly 1
    assert all(r["retention"] == 1.0 for r in rows if r["week_offset"] == 0)


def test_idf_rarity_bounds(spark):
    out = queryset.QUERIES["doc_idf_rarity"](spark, SF_DIR)
    rows = out.collect()
    assert rows
    n_docs = out.sparkSession.read.parquet(f"{SF_DIR}/documents.parquet").count()
    import math

    for r in rows:
        assert 0 <= r["n_rare"] <= r["n_distinct_tokens"]
        # idf of any token is in (0, ln(N)]
        assert 0.0 < r["mean_idf"] <= math.log(n_docs) + 1e-9


def test_ngram_novelty_bounds(spark):
    rows = queryset.QUERIES["doc_ngram_novelty"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["novelty_ratio"] <= 1.0
        assert r["n_novel"] <= r["n_shingles"]


def test_daily_ma7_frame_semantics(spark):
    rows = queryset.QUERIES["daily_revenue_ma7"](spark, SF_DIR).collect()
    assert rows
    by_day = sorted(rows, key=lambda r: r["day"])
    # day 1 has an empty trailing frame beyond itself: ma7 == own revenue
    assert abs(by_day[0]["ma7"] - by_day[0]["revenue"]) < 0.01
    # a RANGE frame average stays inside the window's value envelope
    for i, r in enumerate(by_day):
        window = [x["revenue"] for x in by_day[max(0, i - 6) : i + 1]]
        assert min(window) - 0.01 <= r["ma7"] <= max(window) + 0.01


def test_session_stats_invariants(spark):
    rows = queryset.QUERIES["session_stats"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_sessions"] >= 1
        assert r["avg_events"] >= 1.0
        assert r["avg_duration_secs"] >= 0.0
        assert 0.0 <= r["bounce_rate"] <= 1.0


def test_fuzzy_pairs_exact_on_known_strings(spark):
    out = queryset.QUERIES["text_fuzzy_near_pairs"](spark, SF_DIR)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["doc_b"] == r["doc_a"] + 1
        assert r["edit_dist"] >= 0
        assert 0.0 <= r["sim"] <= 1.0
    # pin the DP itself on a canonical case
    assert spark.sql("select levenshtein('kitten', 'sitting') d").first()["d"] == 3


def test_table_checksum_is_order_insensitive(spark):
    base = queryset.QUERIES["table_checksum_orders"](spark, SF_DIR)
    rows1 = {tuple(r) for r in base.collect()}
    # same data read through a shuffled/re-partitioned path: digest identical
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as FF

    o = load_table(spark, SF_DIR, "orders").repartition(7, "o_custkey")
    canon = FF.concat_ws(
        "|",
        FF.col("o_orderkey").cast("string"),
        FF.col("o_custkey").cast("string"),
        FF.col("o_orderpriority"),
    )
    rh = FF.conv(FF.substring(FF.md5(canon), 1, 12), 16, 10).cast("decimal(38,0)")
    rows2 = {
        tuple(r)
        for r in o.select(FF.col("o_orderstatus").alias("status"), rh.alias("rh"))
        .groupBy("status")
        .agg(
            FF.count("*").alias("n_rows"),
            FF.sum("rh").cast("decimal(38,0)").cast("string").alias("checksum"),
        )
        .collect()
    }
    assert rows1 == rows2


def test_rfm_scores_are_quartiles(spark):
    rows = queryset.QUERIES["customer_rfm_segments"](spark, SF_DIR).collect()
    assert rows
    for col in ("r_score", "f_score", "m_score"):
        vals = [r[col] for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
        # ntile(4) over n rows: bucket sizes differ by at most 1
        from collections import Counter

        sizes = Counter(vals).values()
        assert max(sizes) - min(sizes) <= 1
    assert all(r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}" for r in rows)


def test_yearly_growth_lag_null_first(spark):
    rows = sorted(
        queryset.QUERIES["yearly_revenue_growth"](spark, SF_DIR).collect(),
        key=lambda r: r["yr"],
    )
    assert rows[0]["yoy_growth"] is None
    assert all(r["yoy_growth"] is not None for r in rows[1:])
