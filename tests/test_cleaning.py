"""Unit tests for the cleaning expression library (SURVEY §2.7 F1-F20,
intended semantics per §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.functions import cleaning


def test_cast_float_junk_to_null(spark):
    df = spark.createDataFrame([("1.5",), ("junk",), (None,)], ["x"])
    vals = [r[0] for r in df.select(cleaning.cast_float("x").alias("v")).collect()]
    assert vals == [1.5, None, None]


def test_cast_date(spark):
    df = spark.createDataFrame([("2021-02-03",), ("nope",)], ["d"])
    vals = [r[0] for r in df.select(cleaning.cast_date("d").alias("v")).collect()]
    assert str(vals[0]) == "2021-02-03" and vals[1] is None


def test_emp_length_recode(spark):
    """B1 fixed: the reference's loan_condition intent (`spark_etl.py:19-27`)."""
    rows = [("10+ years",), ("< 1 year",), ("5 years",), (None,)]
    df = spark.createDataFrame(rows, ["e"])
    vals = [r[0] for r in df.select(cleaning.emp_length_recode("e").alias("v")).collect()]
    assert vals == [10, 0, 5, None]


def test_like_recode_first_match_wins(spark):
    df = spark.createDataFrame([("1-URGENT",), ("5-LOW",), ("other",)], ["p"])
    col = cleaning.like_recode("p", [("1%", 1), ("5%", 5)], otherwise=F.lit(0))
    vals = [r[0] for r in df.select(col.alias("v")).collect()]
    assert vals == [1, 5, 0]


def test_leading_int(spark):
    df = spark.createDataFrame([("  36 months",), ("60 months",)], ["t"])
    vals = [r[0] for r in df.select(cleaning.leading_int("t", 2).alias("v")).collect()]
    assert vals == [36, 60]


def test_fill_nulls(spark):
    df = spark.createDataFrame([(None, None), (2.0, "Verified")], ["amt", "vs"])
    out = cleaning.fill_nulls(df, numeric_zero=["amt"], string_fills={"vs": "Not Verified"})
    rows = sorted(out.collect())
    assert rows[0]["amt"] == 0.0 and rows[0]["vs"] == "Not Verified"


def test_replace_na_tokens(spark):
    df = spark.createDataFrame([("n/a",), ("ok",)], ["s"])
    vals = [r[0] for r in cleaning.replace_na_tokens(df).collect()]
    assert vals == [None, "ok"]


def test_blank_to_null(spark):
    df = spark.createDataFrame([("  ",), ("",), ("x",)], "s: string")
    vals = [r[0] for r in df.select(cleaning.blank_to_null("s").alias("v")).collect()]
    assert vals == [None, None, "x"]


def test_nan_to_null(spark):
    df = spark.createDataFrame([(float("nan"),), (1.0,)], ["x"])
    vals = [r[0] for r in df.select(cleaning.nan_to_null("x").alias("v")).collect()]
    assert vals == [None, 1.0]


def test_not_null_filter(spark):
    df = spark.createDataFrame([("a",), (None,)], "m: string")
    assert cleaning.not_null_filter(df, "m").count() == 1


def test_watermark_delta(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    assert cleaning.watermark_delta(df, "k", 6).count() == 3
    assert cleaning.watermark_delta(df, "k", None).count() == 10
