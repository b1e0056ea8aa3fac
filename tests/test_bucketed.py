"""Bucketed tables: the co-located join must plan with zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") + 7).alias("vb"))
    write_bucketed(a, "t_bucket_a", "k", num_buckets=8)
    write_bucketed(b, "t_bucket_b", "k", num_buckets=8)
    yield "t_bucket_a", "t_bucket_b"
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    joined = bucketed_join(spark, ta, tb, on="k")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "co-bucketed join must not shuffle either side"


def test_bucketed_join_correct(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = bucketed_join(spark, ta, tb, on="k")
    assert got.count() == 500
    row = got.where(F.col("k") == 42).first()
    assert row["va"] == 84 and row["vb"] == 49
