"""Declarative expectations: one-pass compilation, per-kind semantics,
NULL conventions, plan shape (one job for all row-level constraints)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators.expectations import (
    expect_accepted_values,
    expect_between,
    expect_foreign_key,
    expect_matches,
    expect_not_null,
    expect_that,
    expect_unique,
    validate,
)


def _report(df, exps, **kw):
    return {
        r["expectation"]: (r["violations"], r["passed"])
        for r in validate(df, exps, **kw).collect()
    }


def test_row_level_kinds_and_null_convention(spark):
    df = spark.createDataFrame(
        [
            ("a", 10, "x@y.io"),
            ("b", -5, "nope"),
            (None, 200, None),
            ("a", None, "garbage x@y.io garbage"),  # embedded fragment ≠ full match
        ],
        "k string, n int, email string",
    )
    got = _report(
        df,
        [
            expect_not_null("k"),
            expect_accepted_values("k", ["a", "b"]),
            expect_between("n", 0, 100),
            expect_matches("email", r"[^@]+@[^@]+\.[a-z]+"),
            expect_that("n_even", (F.col("n") % 2 == 0) | F.col("n").isNull()),
        ],
    )
    assert got["not_null(k)"] == (1, False)
    # NULL k is "not applicable" for accepted_values (covered by not_null)
    assert got["accepted_values(k)"] == (0, True)
    assert got["between(n,0,100)"] == (2, False)  # -5 and 200; NULL exempt
    assert got["matches(email)"] == (2, False)  # 'nope' + embedded fragment; NULL exempt
    assert got["n_even"] == (1, False)  # -5

def test_unique_exact_and_approx(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (None, "c")], "id int, v string"
    )
    got = _report(df, [expect_unique("id"), expect_unique("id", "v")])
    # null-containing keys are excluded from the uniqueness judgment
    assert got["unique(id)"] == (1, False)
    assert got["unique(id,v)"] == (1, False)
    ok = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    assert _report(ok, [expect_unique("id")])["unique(id)"] == (0, True)
    # HLL path returns the same verdict on clean data
    assert _report(ok, [expect_unique("id")], approx_unique=True)["unique(id)"][1]


def test_foreign_key_orphans(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    got = _report(child, [expect_foreign_key("fk", parent, "pk")])
    assert got["foreign_key(fk)"] == (1, False)  # 9 is an orphan; NULL exempt


def test_row_level_constraints_compile_to_one_job(spark):
    """All row-level expectations must land in a single aggregate: the
    tracker sees exactly one job for the whole contract (the reference ran
    one job per metric — at 100 TB, 40 constraints = 40 scans)."""
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("n"), F.lit("a").alias("k")
    )
    exps = [
        expect_not_null("k"),
        expect_accepted_values("k", ["a"]),
        expect_between("n", 0, 6),
        expect_that("id_nonneg", F.col("id") >= 0),
    ]
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(contract):
        # max-id delta, not list-length delta: the tracker retains only
        # recent jobs, so lengths go negative once a long session evicts
        before = max(tracker.getJobIdsForGroup(None) or [0])
        report = validate(df, contract)
        assert all(r["passed"] for r in report.collect())
        return max(tracker.getJobIdsForGroup(None) or [0]) - before

    # job count must be CONSTANT in the number of row-level constraints
    # (AQE may split the one agg into a couple of jobs — that's fine; a
    # per-constraint scan is not)
    assert jobs_for(exps) == jobs_for(exps[:1])
