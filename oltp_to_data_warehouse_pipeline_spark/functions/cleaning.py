"""Cleaning expression library — the reference's scalar-function surface.

Implements the *intended* semantics of `spark_etl.py` (reference) F1-F20 as
pure column expressions (SURVEY.md §2.7, §2.10 for the bug-vs-intent calls):

- F1-F3  permissive casts (non-castable -> NULL): `spark_etl.py:34,43,69`
- F4     abs-normalization of amounts:            `spark_etl.py:47-54`
- F5/F6  LIKE-driven when-chain recode:           `spark_etl.py:19-27` (B1 fixed)
- F7     leading-substring integer:               `spark_etl.py:71-72`
- F8/F9  null fills:                              `spark_etl.py:34,75,78,91`
- F10    value replace 'n/a' -> NULL:             `spark_etl.py:58-59`
- F20    null predicates:                         `spark_etl.py:88`

Everything returns a Column; nothing touches the driver.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cast_float(c: Column | str) -> Column:
    """F1 — permissive cast to float; junk text becomes NULL (non-ANSI)."""
    return F.col(c).cast("float") if isinstance(c, str) else c.cast("float")


def cast_double(c: Column | str) -> Column:
    """F1 at double precision — preferred for money at 100 TB (no float drift)."""
    return F.col(c).cast("double") if isinstance(c, str) else c.cast("double")


def cast_int(c: Column | str) -> Column:
    """F2 — permissive cast to int."""
    return F.col(c).cast("int") if isinstance(c, str) else c.cast("int")


def cast_date(c: Column | str, fmt: str | None = None) -> Column:
    """F3/F12 — text -> DATE, optionally with an explicit pattern."""
    col = F.col(c) if isinstance(c, str) else c
    return F.to_date(col, fmt) if fmt else F.to_date(col)


def abs_amount(c: Column | str) -> Column:
    """F4 — negative amounts/balances -> positive (`Transaction_amt_updated`)."""
    return F.abs(F.col(c) if isinstance(c, str) else c)


def like_recode(c: Column | str, rules: Iterable[tuple[str, object]], otherwise: Column | None = None) -> Column:
    """F5/F6 — ordered LIKE-pattern when-chain.

    ``rules`` is [(like_pattern, value), ...]; first match wins; unmatched
    rows keep the original value unless ``otherwise`` is given.  This is the
    intended form of the reference's `loan_condition` (B1 fixed).
    """
    col = F.col(c) if isinstance(c, str) else c
    expr: Column | None = None
    for pattern, value in rules:
        cond = col.like(pattern)
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    if expr is None:
        return col
    return expr.otherwise(otherwise if otherwise is not None else col)


def emp_length_recode(c: Column | str) -> Column:
    """The reference's concrete F5 instance: '10+ years'->10, '< 1 year'->0,
    else leading integer of the text (e.g. '5 years' -> 5)."""
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.when(col.like("%10+%"), F.lit(10))
        .when(col.like("%< 1 year%"), F.lit(0))
        .otherwise(F.regexp_extract(col, r"(\d+)", 1).cast("int"))
    )


def leading_int(c: Column | str, length: int = 2) -> Column:
    """F7 — substring(c,1,length) cast to int ('  36 months' -> 36)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.substring(F.trim(col), 1, length).cast("int")


def fill_nulls(df: DataFrame, numeric_zero: Iterable[str] = (), string_fills: Mapping[str, str] | None = None) -> DataFrame:
    """F8/F9 — fill numeric columns with 0 and string columns per mapping."""
    out = df
    numeric_zero = list(numeric_zero)
    if numeric_zero:
        out = out.na.fill(0, subset=numeric_zero)
    for col_name, value in (string_fills or {}).items():
        out = out.na.fill(value, subset=[col_name])
    return out


def replace_na_tokens(df: DataFrame, tokens: Iterable[str] = ("n/a",)) -> DataFrame:
    """F10 — sentinel strings ('n/a', ...) -> NULL across all string columns."""
    return df.na.replace(list(tokens), None)


def blank_to_null(c: Column | str) -> Column:
    """P5 — empty-or-whitespace string -> NULL (`mongo_postgres_cdc.py:139-142`)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.nullif(F.trim(col), F.lit(""))


def not_null_filter(df: DataFrame, col_name: str) -> DataFrame:
    """P3/F20 — drop rows where ``col_name`` is NULL (`spark_etl.py:85-88`)."""
    return df.filter(F.col(col_name).isNotNull())


def nan_to_null(c: Column | str) -> Column:
    """F25 — float NaN -> NULL (`mongo_postgres_cdc.py:158-161`)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


def watermark_delta(df: DataFrame, key: str, watermark: int | None) -> DataFrame:
    """P4 — high-watermark incremental filter (`spark_etl.py:143-144`, B5
    fixed: the key must be a *source* monotonic column, not a fresh
    monotonically_increasing_id).  The predicate is a plain comparison so it
    pushes down to parquet row-group stats / JDBC WHERE clauses."""
    if watermark is None:
        return df
    return df.filter(F.col(key) > F.lit(watermark))
