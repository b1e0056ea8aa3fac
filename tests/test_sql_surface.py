"""SQL-only access to the operator library (round-9 verdict item 3):
after ONE register_sql_surface() call, a client speaking nothing but
spark.sql must reach span excision, repetition, exact dedup, and the
HLL/KMV/qsketch sketch algebra — and get values identical to the
DataFrame API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
from oltp_to_data_warehouse_pipeline_spark.plans.sql_surface import (
    register_sql_surface,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def surface(spark):
    names = register_sql_surface(spark, SF_DIR)
    return set(names)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_registration_names(surface):
    assert {
        "hll_estimate_tf", "kmv_estimate_tf", "kmv_set_est_tf",
        "qsketch_quantiles_tf", "sqlops_span_excised", "sqlops_span_report",
        "sqlops_repetition", "sqlops_dedup_docs",
        "sqlops_hll_day_registers", "sqlops_kmv_day_sketch",
        "sqlops_qsketch_day",
    } <= surface


def test_hll_estimate_sql_equals_dataframe_api(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import hll

    got = spark.sql(
        "SELECT grp, est_distinct FROM hll_estimate_tf("
        "TABLE(sqlops_hll_day_registers) PARTITION BY grp)"
    )
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "d", F.col("ts").cast("date")
    )
    want = hll.hll_estimate(hll.hll_sketch(ev, "user_id", ["d"]), ["d"]).select(
        F.date_format("d", "yyyy-MM-dd").alias("grp"), "est_distinct"
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_kmv_estimate_sql_equals_dataframe_api(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import kmv

    got = spark.sql(
        "SELECT grp, est_distinct FROM kmv_estimate_tf("
        "TABLE(sqlops_kmv_day_sketch) PARTITION BY grp, k => 64)"
    )
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "d", F.col("ts").cast("date")
    )
    sk = kmv.kmv_sketch(ev, "user_id", ["d"], k=64)
    want = kmv.kmv_estimate(sk, ["d"], k=64).select(
        F.date_format("d", "yyyy-MM-dd").alias("grp"), "est_distinct"
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_kmv_set_ops_sql_equals_dataframe_api(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import kmv

    days = [
        r["grp"]
        for r in spark.sql(
            "SELECT DISTINCT grp FROM sqlops_kmv_day_sketch ORDER BY grp LIMIT 2"
        ).collect()
    ]
    assert len(days) == 2
    got = spark.sql(
        f"""
        SELECT * FROM kmv_set_est_tf(TABLE(
          SELECT CASE WHEN grp = '{days[0]}' THEN 'a' ELSE 'b' END AS side, h
          FROM sqlops_kmv_day_sketch WHERE grp IN ('{days[0]}', '{days[1]}')
        ) WITH SINGLE PARTITION, k => 64)
        """
    )
    sk = spark.table("sqlops_kmv_day_sketch")
    want = kmv.kmv_intersect_estimate(
        sk.where(F.col("grp") == days[0]).select("h"),
        sk.where(F.col("grp") == days[1]).select("h"),
        k=64,
    )
    assert _rows(got) == _rows(want)


def test_qsketch_quantile_sql_equals_dataframe_api(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import qsketch

    got = spark.sql(
        "SELECT grp, m, q FROM qsketch_quantiles_tf("
        "TABLE(sqlops_qsketch_day) PARTITION BY grp, p => 0.5D)"
    )
    o = load_table(spark, SF_DIR, "orders").withColumn(
        "d", F.col("o_orderdate").cast("date")
    )
    sk = qsketch.qsample_sketch(o, "o_orderkey", "o_totalprice", ["d"], k=256)
    want = qsketch.qsample_quantiles(sk, ["d"], {"q": 0.5}).select(
        F.date_format("d", "yyyy-MM-dd").alias("grp"), "m", "q"
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_span_excision_and_report_views_compose_in_sql(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import spans

    d = load_table(spark, SF_DIR, "documents")
    want = _rows(spans.span_excised_corpus(d, "doc_id", "text"))
    got = _rows(spark.sql("SELECT doc_id, kept_tokens, rebuilt_md5 FROM sqlops_span_excised"))
    assert got == want and len(got) > 0

    # SQL composes OVER the operator view: aggregate the excision report
    agg = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS flagged_docs, "
        "CAST(SUM(tokens_flagged) AS BIGINT) AS tokens "
        "FROM sqlops_span_report WHERE retention_pct < 100.0"
    ).collect()[0]
    rep = spans.span_excision_report(d, "doc_id", "text").where(
        F.col("retention_pct") < 100.0
    )
    assert agg["flagged_docs"] == rep.count()
    assert agg["tokens"] == rep.agg(F.sum("tokens_flagged")).collect()[0][0]


def test_repetition_and_dedup_views(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import dedup, repetition

    d = load_table(spark, SF_DIR, "documents")
    got = _rows(
        spark.sql(
            "SELECT doc_id, dup_10_frac FROM sqlops_repetition "
            "WHERE dup_10_frac > 0"
        )
    )
    want = _rows(
        repetition.repetition_signals(d)
        .where(F.col("dup_10_frac") > 0)
        .select("doc_id", "dup_10_frac")
    )
    assert got == want

    n_sql = spark.sql("SELECT COUNT(*) AS n FROM sqlops_dedup_docs").collect()[0]["n"]
    assert n_sql == dedup.lww_dedup(d, ["text"], [F.col("doc_id").asc()]).count()
    assert n_sql <= d.count()


def test_udtf_refuses_group_mixing_without_partition_by(spark, surface):
    """Round-10 review: without PARTITION BY grp one UDTF instance sees
    many groups — it must refuse loudly, not emit a silently merged
    estimate attributed to an arbitrary grp."""
    spark.createDataFrame(
        [("a", 1, 3), ("b", 2, 4)], "grp string, j long, r int"
    ).coalesce(1).createOrReplaceTempView("mixed_regs")
    with pytest.raises(Exception, match="PARTITION BY grp"):
        spark.sql(
            "SELECT * FROM hll_estimate_tf(TABLE(mixed_regs))"
        ).collect()


def test_registration_tolerates_partial_fixture(spark, tmp_path):
    """Round-10 review: a fixture missing events/orders (the 1000x decade
    dir carries only documents+embeddings) must register the views it CAN
    and skip the rest — not crash the CLI before the statement runs."""
    import os
    import shutil

    part = str(tmp_path / "partial_sf")
    os.makedirs(part)
    src = "/root/testdata/sf0.001/documents.parquet"
    copy = shutil.copytree if os.path.isdir(src) else shutil.copy
    copy(src, f"{part}/documents.parquet")
    names = set(register_sql_surface(spark, part))
    assert "sqlops_span_excised" in names and "hll_estimate_tf" in names
    assert "sqlops_hll_day_registers" not in names
    assert "sqlops_qsketch_day" not in names
    # re-register the full surface for any later module-scoped user
    register_sql_surface(spark, SF_DIR)


# ---------------------------------------------------------------------------
# Similarity + LM families (round-10 verdict item 4: the asymmetry where a
# SQL-only client could reach sketch algebra but not cosine/ANN/LM scoring)
# ---------------------------------------------------------------------------


def test_similarity_lm_registration_names(surface):
    assert {
        "sqlops_cosine_topk", "sqlops_sharded_near_dup",
        "sqlops_lm_scores", "sqlops_lm_gate",
    } <= surface


def test_cosine_topk_sql_equals_dataframe_api(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import similarity

    got = spark.sql("SELECT * FROM sqlops_cosine_topk")
    emb = load_table(spark, SF_DIR, "embeddings")
    want = similarity.cosine_topk(emb, emb.orderBy("vec_id").limit(100), k=5)
    assert _rows(got) == _rows(want) and got.count() > 0


def test_sharded_near_dup_sql_equals_dataframe_api(spark, surface):
    """View ≡ API at the view's pinned near-dup parameters
    (threshold = recall_sim = 0.85, so the recall target covers the whole
    advertised range).  The fixture's max background cosine is ~0.48, so
    BOTH sides are legitimately empty here — emptiness equality is the
    contract; nonempty behavior is pinned by the planted-twin operator
    tests and the oracle-gated sharded_near_dup query."""
    from oltp_to_data_warehouse_pipeline_spark.operators import similarity

    got = spark.sql("SELECT * FROM sqlops_sharded_near_dup")
    emb = load_table(spark, SF_DIR, "embeddings").withColumn(
        "shard", F.floor(F.col("vec_id") / 250)
    )
    want = similarity.sharded_near_dup(
        emb, "shard", n_shard=250, threshold=0.85, recall_sim=0.85, dim=64
    )
    assert _rows(got) == _rows(want)
    assert got.columns == ["id_a", "id_b", "sim"]


def test_registration_runs_no_data_jobs_for_lazy_views(spark):
    """register_sql_surface without ivf_index_path must launch no
    DATA-scale Spark work (round-11 review: the cosine_topk view's
    bounded() probe was running a corpus scan and pinning blocks at
    registration).  The only jobs allowed are load_table's parquet
    schema/footer reads — single-task metadata jobs, one per catalog
    table — so the assertion is on task counts, not job counts."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    group = "sqlsurface-lazy-reg"
    sc.setJobGroup(group, "registration must be lazy")
    try:
        register_sql_surface(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None)
    jobs = tracker.getJobIdsForGroup(group) or []
    fat = []
    for j in jobs:
        info = tracker.getJobInfo(j)
        for sid in info.stageIds if info else []:
            s = tracker.getStageInfo(sid)
            if s and s.numTasks > 1:
                fat.append((j, sid, s.numTasks))
    assert not fat, f"registration launched data-scale stages: {fat}"


def test_lm_gate_sql_equals_dataframe_api(spark, surface):
    from oltp_to_data_warehouse_pipeline_spark.operators import lm

    got = spark.sql("SELECT * FROM sqlops_lm_gate")
    d = load_table(spark, SF_DIR, "documents")
    want = lm.lm_quality_gate(d, slack_bits=1.0)
    assert _rows(got) == _rows(want) and got.count() > 0


def test_ivf_topk_sql_equals_dataframe_api(spark, tmp_path):
    """The opt-in indexed view: build a small IVF index, re-register the
    surface with ivf_index_path, and the SQL view must equal the
    ivf_topk_indexed API probe over the same pinned query set."""
    from oltp_to_data_warehouse_pipeline_spark.operators import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf_index")
    centroids = similarity.ivf_centroids(emb, k=4, iters=2)
    similarity.ivf_write_index(emb, path, centroids)
    names = register_sql_surface(spark, SF_DIR, ivf_index_path=path)
    assert "sqlops_ivf_topk" in names
    got = spark.sql("SELECT * FROM sqlops_ivf_topk")
    want = similarity.ivf_topk_indexed(
        spark, path, emb.orderBy("vec_id").limit(100), k=5, nprobe=2
    )
    assert _rows(got) == _rows(want) and got.count() > 0


def test_sequence_pack_sql_equals_dataframe_api(spark, surface):
    assert "sqlops_sequence_pack" in surface
    from oltp_to_data_warehouse_pipeline_spark.functions import text
    from oltp_to_data_warehouse_pipeline_spark.operators import compaction

    got = spark.sql("SELECT * FROM sqlops_sequence_pack")
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", text.token_count("text").cast("bigint").alias("n_tokens")
    )
    want = compaction.sequence_pack(d, ["lang"], capacity=512)
    assert _rows(got) == _rows(want) and got.count() > 0
    # a SQL client can aggregate the plan directly (the fill audit shape)
    agg = spark.sql(
        "SELECT count(DISTINCT (lang, block, seq)) AS n_seqs,"
        " sum(n_tokens) AS toks FROM sqlops_sequence_pack"
    ).collect()[0]
    assert agg["n_seqs"] > 0 and agg["toks"] > 0
