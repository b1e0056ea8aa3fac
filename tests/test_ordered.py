"""Distributed order statistics (operators/ordered.py): the two-phase
rank / running-sum / ntile must be BIT-EQUAL to the single-partition
window forms — on skewed (Zipf-ish) data with heavy ties, where both the
equal-depth banding and the tiebreak logic earn their keep."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import ordered


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish values with many ties (v = 10 for half the rows), plus NULLs
    rows = []
    for i in range(500):
        v = 10 if i % 2 == 0 else (i % 97) + (i % 7) * 100
        rows.append((i, v, float(i % 13)))
    rows += [(1000 + j, None, 1.0) for j in range(5)]
    return spark.createDataFrame(rows, "id long, v long, x double")


def test_rank_matches_single_window(skewed):
    want = {
        (r["id"], r["r"])
        for r in skewed.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("r")
        ).collect()
    }
    got = {
        (r["id"], r["rank"])
        for r in ordered.global_order_stats(
            skewed, key=F.col("v"), tiebreaks=[F.col("id")], n_bands=16
        ).collect()
    }
    assert got == want


def test_descending_rank_and_running_sum(skewed):
    w = Window.orderBy(F.col("v").desc(), "id")
    want = {
        (r["id"], r["r"], r["cum"])
        for r in skewed.where(F.col("v").isNotNull())
        .select(
            "id",
            F.row_number().over(w).alias("r"),
            F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        )
        .collect()
    }
    got = {
        (r["id"], r["rank"], r["cum"])
        for r in ordered.global_order_stats(
            skewed.where(F.col("v").isNotNull()),
            key=-F.col("v"),
            tiebreaks=[F.col("id")],
            running={"cum": F.col("x")},
            n_bands=16,
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,total_rows", [(4, 503), (64, 100), (5, 5), (7, 3)])
def test_ntile_matches_builtin(spark, n, total_rows):
    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(total_rows)], "id long, v long"
    )
    want = {
        (r["id"], r["t"])
        for r in df.select(
            "id", F.ntile(n).over(Window.orderBy("v", "id")).alias("t")
        ).collect()
    }
    ranked = ordered.global_order_stats(
        df, key=F.col("v"), tiebreaks=[F.col("id")], n_bands=8
    )
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    got = {
        (r["id"], r["t"])
        for r in ranked.crossJoin(F.broadcast(tot))
        .select(
            "id", ordered.ntile_from_rank(F.col("rank"), F.col("k"), n).alias("t")
        )
        .collect()
    }
    assert got == want


def test_no_data_sized_global_window_in_plan(skewed):
    """The whole point: the only unpartitioned window in the physical plan
    must take the band-totals aggregate (≤ n_bands rows), never the input
    relation."""
    df = ordered.global_order_stats(
        skewed, key=F.col("v"), tiebreaks=[F.col("id")], n_bands=16
    )
    plan = df._jdf.queryExecution().optimizedPlan()
    stack, found = [plan], 0
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            found += 1
            kid_names = set()
            kids = [node.children().apply(0)]
            while kids:
                k = kids.pop()
                kid_names.add(k.nodeName())
                c = k.children()
                for i in range(c.size()):
                    kids.append(c.apply(i))
            assert "Aggregate" in kid_names
        c = node.children()
        for i in range(c.size()):
            stack.append(c.apply(i))
    assert found == 1  # exactly the band-offset window


def test_single_band_degenerate(spark):
    df = spark.createDataFrame([(i, 7) for i in range(10)], "id long, v long")
    got = sorted(
        (r["id"], r["rank"])
        for r in ordered.global_order_stats(
            df, key=F.col("v"), tiebreaks=[F.col("id")], n_bands=1
        ).collect()
    )
    assert got == [(i, i + 1) for i in range(10)]
