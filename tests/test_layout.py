"""Z-order layout: interleave correctness vs a Python reference, scaling
exactness, and the writer's file-level bounding-box property."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators.layout import (
    scaled,
    with_zvalue,
    zvalue,
)
from oltp_to_data_warehouse_pipeline_spark.sources.files import write_zordered


def _py_interleave(vals: list[int], bits: int = 16) -> int:
    n = len(vals)
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z += ((v >> i) & 1) << (i * n + (n - 1 - j))
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = df.select(
        "x", "y", zvalue([F.col("x"), F.col("y")], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_interleave([r["x"], r["y"]]), (r["x"], r["y"])


def test_zvalue_orders_locally():
    """Adjacent z-values must be spatially close-ish: the classic property
    check is that quadrant prefixes sort before finer bits."""
    # top-left quadrant (both high bits 0) < any point with a high bit set
    assert _py_interleave([0x7FFF, 0x7FFF]) < _py_interleave([0x8000, 0])
    assert _py_interleave([0x7FFF, 0x7FFF]) < _py_interleave([0, 0x8000])


def test_scaled_exact_integer_division(spark):
    """scaled() must equal exact floor((c-min)*65535/(max-min)) — the pmod
    spelling exists so no double quotient is ever floored."""
    df = spark.createDataFrame([(v,) for v in (0, 1, 7, 99, 100)], "v bigint")
    got = df.select(
        scaled(F.col("v"), F.lit(0), F.lit(100), bits=16).alias("s")
    ).collect()
    for r, v in zip(sorted(got, key=lambda r: r["s"]), (0, 1, 7, 99, 100)):
        assert r["s"] == (v * 65535) // 100
    # degenerate single-value range maps to 0
    one = df.select(scaled(F.col("v"), F.lit(5), F.lit(5)).alias("s")).collect()
    assert all(r["s"] == 0 for r in one)


def test_write_zordered_bounds_both_columns(spark, tmp_path):
    """Every output file's bounding box must be tighter than the global
    range in BOTH dimensions — that is the data-skipping property a
    single-column sort cannot give.  (A custkey-sorted layout would leave
    the day span at ~full range in every file.)"""
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("dy"),
    )
    path = str(tmp_path / "zorders")
    write_zordered(o, path, ["ck", "dy"], num_files=16)

    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("ck") - F.min("ck")).alias("ck_span"),
            (F.max("dy") - F.min("dy")).alias("dy_span"),
        )
        .collect()
    )
    g = o.agg(
        (F.max("ck") - F.min("ck")).alias("ck_span"),
        (F.max("dy") - F.min("dy")).alias("dy_span"),
    ).collect()[0]
    assert len(per_file) > 4
    # average per-file span must be well under the global span in BOTH axes
    avg_ck = sum(r["ck_span"] for r in per_file) / len(per_file)
    avg_dy = sum(r["dy_span"] for r in per_file) / len(per_file)
    assert avg_ck < 0.8 * g["ck_span"], (avg_ck, g["ck_span"])
    assert avg_dy < 0.8 * g["dy_span"], (avg_dy, g["dy_span"])


def test_with_zvalue_is_narrow_over_broadcast_bounds(spark):
    """The z computation must not shuffle the data: the only exchange
    allowed below the projection is the 1-row bounds broadcast."""
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("dy"),
    )
    df = with_zvalue(o, ["ck", "dy"])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 0, "z-value must not shuffle rows"
