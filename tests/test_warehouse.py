"""Warehouse builders + plan-shape checks (broadcast star join, pushdown)."""

from __future__ import annotations

import contextlib
import io

from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
from oltp_to_data_warehouse_pipeline_spark.functions import cleaning
from oltp_to_data_warehouse_pipeline_spark.plans import warehouse

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_fact_surrogate_stable_under_repartition(spark):
    """B5 fix: surrogate keys must not depend on partitioning (unlike
    monotonically_increasing_id in the reference)."""
    o = load_table(spark, SF, "orders")
    a = warehouse.build_fact(o).select("fact_id", "order_id")
    b = warehouse.build_fact(o.repartition(7)).select("fact_id", "order_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fact_surrogate_unique(spark):
    f = warehouse.build_fact(load_table(spark, SF, "orders"))
    assert f.select("fact_id").distinct().count() == f.count()


def test_dim_date_one_row_per_date(spark):
    o = load_table(spark, SF, "orders")
    dim = warehouse.build_dim_date(o, "o_orderdate")
    assert dim.count() == dim.select("date_id").distinct().count()
    row = dim.where("date_id = '19960229'").first()
    if row:  # 1996 is a leap year
        assert row["is_leapyear"] == 1


def test_star_join_is_broadcast(spark):
    fact = warehouse.build_fact(load_table(spark, SF, "orders"))
    cust = warehouse.build_customer_dim(load_table(spark, SF, "customer"))
    joined = warehouse.star_join(
        fact, cust, load_table(spark, SF, "nation"), load_table(spark, SF, "region")
    )
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_watermark_filter_pushed_to_scan(spark):
    o = load_table(spark, SF, "orders")
    delta = cleaning.watermark_delta(o, "o_orderkey", 1000).select("o_orderkey")
    plan = _plan(delta)
    assert "GreaterThan(o_orderkey,1000)" in plan
