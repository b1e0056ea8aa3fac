"""dim_date derivations (F11-F18) — Postgres-convention parity + B6 fix.

Edge cases per FIXTURES.md §B3: leap years (century rules), week
boundaries, both weekend days.
"""

from __future__ import annotations

import datetime

import pytest

from oltp_to_data_warehouse_pipeline_spark.functions import dates


def _one(spark, d: str, expr_builder):
    df = spark.createDataFrame([(datetime.date.fromisoformat(d),)], "d: date")
    return df.select(expr_builder("d").alias("v")).first()["v"]


@pytest.mark.parametrize(
    "day,expected",
    [("2021-01-03", 0), ("2021-01-04", 1), ("2021-01-09", 6)],  # Sun, Mon, Sat
)
def test_dow_pg(spark, day, expected):
    assert _one(spark, day, dates.dow_pg) == expected


@pytest.mark.parametrize(
    "day,expected",
    [("2021-01-04", 1), ("2021-01-03", 7), ("2021-01-09", 6)],  # Mon, Sun, Sat
)
def test_isodow(spark, day, expected):
    assert _one(spark, day, dates.isodow) == expected


@pytest.mark.parametrize(
    "day,expected",
    [("2021-01-02", 0), ("2021-01-03", 0), ("2021-01-04", 1), ("2021-01-08", 1)],
)
def test_is_weekday(spark, day, expected):
    assert _one(spark, day, dates.is_weekday) == expected


@pytest.mark.parametrize(
    "day,expected",
    [
        ("2024-02-29", 1),  # divisible by 4
        ("2023-06-01", 0),
        ("2000-01-01", 1),  # divisible by 400
        ("1900-06-01", 0),  # century, not by 400
        ("2100-01-01", 0),
    ],
)
def test_is_leapyear(spark, day, expected):
    assert _one(spark, day, dates.is_leapyear) == expected


def test_names_and_key(spark):
    assert _one(spark, "2021-03-01", dates.day_name) == "Monday"
    assert _one(spark, "2021-03-01", dates.month_name) == "March"
    assert _one(spark, "2021-03-01", dates.date_key) == "20210301"


def test_week_boundary(spark):
    # ISO week: 2021-01-01 (Friday) is week 53 of 2020; 2021-01-04 is week 1.
    assert _one(spark, "2021-01-01", lambda c: dates.date_parts(c)["week"]) == "53"
    assert _one(spark, "2021-01-04", lambda c: dates.date_parts(c)["week"]) == "1"


def test_date_parts_complete(spark):
    parts = dates.date_parts("d")
    expected = {
        "date_full", "year", "month", "quarter", "week", "day",
        "day_of_week", "day_name", "month_name", "is_weekday", "is_leapyear",
    }
    assert set(parts) == expected
