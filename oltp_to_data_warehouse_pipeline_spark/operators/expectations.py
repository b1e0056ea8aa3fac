"""Declarative data expectations: a constraint spec compiled to ONE pass.

The reference's QC (`quality_checks.py:14-33`) hand-codes each metric and
runs a job per metric; `operators/quality.py` collapses the profiles to one
job each.  This module completes that into the production shape (the
Deequ/Great-Expectations pattern, engine-native): callers DECLARE the
table's contract as a list of expectations, and the engine compiles every
row-level constraint into a single aggregate pass — violation counts are
`sum(indicator)` columns of one hash-agg, so checking 40 constraints on a
100 TB table costs one scan, not 40.

Non-row-level constraints keep their true cost visible instead of hiding a
shuffle inside a "check":

- ``unique`` needs a distinct count (one expand in the same agg pass;
  ``approx=True`` swaps in HyperLogLog for the at-scale default);
- ``foreign_key`` is a left-anti probe per relation (broadcast when the
  parent key projection is small — same plan as `quality.fk_orphans`).

The report is a small DataFrame (one row per expectation), so gates can be
persisted next to the warehouse audit tables the way the reference stored
its QC dict.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One constraint.  ``kind`` ∈ {not_null, accepted_values, between,
    matches, unique, foreign_key, custom}."""

    name: str
    kind: str
    column: str | None = None
    values: tuple | None = None          # accepted_values
    lo: float | None = None              # between
    hi: float | None = None              # between
    pattern: str | None = None           # matches (Java regex, full match)
    columns: tuple[str, ...] | None = None  # unique (composite keys)
    parent: DataFrame | None = None      # foreign_key
    parent_key: str | None = None        # foreign_key
    predicate: Column | None = None      # custom: True == row is VALID


def expect_not_null(column: str) -> Expectation:
    return Expectation(f"not_null({column})", "not_null", column=column)


def expect_accepted_values(column: str, values) -> Expectation:
    return Expectation(
        f"accepted_values({column})", "accepted_values", column=column, values=tuple(values)
    )


def expect_between(column: str, lo: float, hi: float) -> Expectation:
    return Expectation(f"between({column},{lo},{hi})", "between", column=column, lo=lo, hi=hi)


def expect_matches(column: str, pattern: str) -> Expectation:
    return Expectation(f"matches({column})", "matches", column=column, pattern=pattern)


def expect_unique(*columns: str) -> Expectation:
    return Expectation(f"unique({','.join(columns)})", "unique", columns=tuple(columns))


def expect_foreign_key(column: str, parent: DataFrame, parent_key: str) -> Expectation:
    return Expectation(
        f"foreign_key({column})", "foreign_key",
        column=column, parent=parent, parent_key=parent_key,
    )


def expect_that(name: str, predicate: Column) -> Expectation:
    return Expectation(name, "custom", predicate=predicate)


def _violation_indicator(e: Expectation) -> Column:
    """Row-level violation indicator (1 = row breaks the expectation).
    NULLs: not_null counts them; the value-shape kinds treat NULL as not
    applicable (pair with not_null to forbid) — the dbt/Deequ convention."""
    c = F.col(e.column) if e.column else None
    if e.kind == "not_null":
        bad = c.isNull()
    elif e.kind == "accepted_values":
        bad = c.isNotNull() & ~c.isin(*e.values)
    elif e.kind == "between":
        bad = c.isNotNull() & ~c.between(e.lo, e.hi)
    elif e.kind == "matches":
        # rlike is substring search; the declared contract is FULL match —
        # anchor so a valid fragment inside garbage cannot pass the gate
        bad = c.isNotNull() & ~c.rlike(f"^(?:{e.pattern})$")
    elif e.kind == "custom":
        bad = ~F.coalesce(e.predicate, F.lit(False))
    else:  # pragma: no cover - guarded by validate()
        raise ValueError(f"not a row-level kind: {e.kind}")
    return F.sum(bad.cast("bigint"))


def validate(
    df: DataFrame, expectations: list[Expectation], approx_unique: bool = False
) -> DataFrame:
    """Run every expectation; return one report row per expectation:
    (expectation, kind, violations, total_rows, passed)."""
    spark = df.sparkSession
    row_level = [e for e in expectations if e.kind not in ("unique", "foreign_key")]
    uniques = [e for e in expectations if e.kind == "unique"]
    fks = [e for e in expectations if e.kind == "foreign_key"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    aggs += [_violation_indicator(e).alias(f"__v{i}") for i, e in enumerate(row_level)]
    counter = F.approx_count_distinct if approx_unique else F.countDistinct
    for i, e in enumerate(uniques):
        # uniqueness is judged on COMPLETE keys only: incomplete tuples are
        # nulled before the distinct (struct(NULL) would otherwise count as
        # a value) and excluded from the row count
        all_set = None
        for col in e.columns:
            cond = F.col(col).isNotNull()
            all_set = cond if all_set is None else (all_set & cond)
        complete_key = F.when(all_set, F.struct(*e.columns))
        aggs.append(counter(complete_key).alias(f"__u{i}"))
        aggs.append(F.sum(all_set.cast("bigint")).alias(f"__uN{i}"))
    one_pass = df.agg(*aggs).first()

    total = one_pass["__total"]
    rows: list[tuple[str, str, int, int]] = []
    for i, e in enumerate(row_level):
        rows.append((e.name, e.kind, int(one_pass[f"__v{i}"] or 0), total))
    for i, e in enumerate(uniques):
        dupes = int(one_pass[f"__uN{i}"] or 0) - int(one_pass[f"__u{i}"] or 0)
        rows.append((e.name, e.kind, max(dupes, 0), total))
    for e in fks:
        parent_keys = e.parent.select(F.col(e.parent_key).alias(e.column)).distinct()
        orphans = (
            df.select(e.column)
            .where(F.col(e.column).isNotNull())
            .join(parent_keys, e.column, "left_anti")
            .count()
        )
        rows.append((e.name, e.kind, int(orphans), total))

    report = spark.createDataFrame(
        rows, "expectation string, kind string, violations long, total_rows long"
    )
    return report.withColumn("passed", F.col("violations") == 0)
