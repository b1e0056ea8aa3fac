"""The loan-domain ETL pipeline (spark_etl semantics end-to-end) on a dirty
fixture per FIXTURES.md §B1."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.plans.etl import IncrementalRun, LoanCleaningConfig, clean_loan_data

ROWS = [
    # (row_id, member_id, Loan_Amount, Annual_Income, emp_length, term,
    #  verification_status, delinq_2yrs, Loan_Application_Date, Transaction_Amount)
    (1, "m1", "25000", "50000", "10+ years", " 36 months", "Verified", "1", "2021-03-05", "-120.5"),
    (2, "m2", "junk", None, "< 1 year", "60 months", None, None, "2022-07-01", "80"),
    (3, None, "1000", "9000", "5 years", " 36 months", "Verified", "2", "2023-01-15", "-5"),  # dropped: no member_id
    (4, "m4", "500", "n/a", "2 years", " 60 months", "Source Verified", "0", "2021-12-31", "7"),
    (1, "m1", "25000", "50000", "10+ years", " 36 months", "Verified", "1", "2021-03-05", "-120.5"),  # exact dup
]
COLS = [
    "row_id", "member_id", "Loan_Amount", "Annual_Income", "emp_length", "term",
    "verification_status", "delinq_2yrs", "Loan_Application_Date", "Transaction_Amount",
]


def _fixture(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_clean_loan_data_full_chain(spark):
    out = clean_loan_data(_fixture(spark))
    rows = {r["row_id"]: r for r in out.collect()}

    assert set(rows) == {1, 2, 4}                       # dup removed, null member_id dropped
    assert rows[2]["Loan_Amount"] == 0.0                # junk -> NULL -> fill 0
    assert rows[2]["Annual_Income"] == 0.0              # NULL -> 0
    assert rows[1]["emp_length"] == 10                  # '10+ years' -> 10
    assert rows[2]["emp_length"] == 0                   # '< 1 year' -> 0
    assert rows[4]["emp_length"] == 2                   # leading int
    assert rows[1]["term"] == 36 and rows[4]["term"] == 60
    assert rows[2]["verification_status"] == "Not Verified"
    assert rows[2]["delinq_2yrs"] == 0
    assert str(rows[1]["Loan_Application_Date"]) == "2021-03-05"
    assert rows[1]["Transaction_Amount_updated"] == 120.5   # abs-normalized
    # 'n/a' scrub ran before numeric handling caveat: Annual_Income was cast
    # first (n/a -> NULL -> 0.0), matching spark_etl's ordering
    assert rows[4]["Annual_Income"] == 0.0


def test_incremental_run_watermark_and_qc(spark):
    df = _fixture(spark)
    run = IncrementalRun(
        watermark_col="row_id",
        quality_keys=("row_id",),
        quality_not_null=("member_id",),
        cleaning_cfg=LoanCleaningConfig(),
    )
    cleaned, wm, qc = run.run(df, prior_watermark=1)
    ids = sorted(r["row_id"] for r in cleaned.collect())
    assert ids == [2, 4]                 # rows ≤ watermark excluded, row 3 dropped by policy
    assert wm == 4
    assert qc["non_empty"] and qc["unique_row_id"] and qc["no_nulls_member_id"]

    # no new rows -> empty delta, watermark HOLDS at prior (a None reset
    # would trigger a full re-extract next run), gate reports empty
    cleaned2, wm2, qc2 = run.run(df, prior_watermark=10)
    assert cleaned2.count() == 0 and wm2 == 10 and not qc2["non_empty"]

    # rows exist past the watermark but ALL fail cleaning (no member_id):
    # the watermark must still advance past them, else every future run
    # re-extracts — and re-appends — the same doomed range
    doomed = spark.createDataFrame(
        [(7, None, "100", "100", "1 year", "36 months", "Verified", "0", "2021-01-01", "1")],
        df.schema,
    )
    cleaned3, wm3, qc3 = run.run(df.unionByName(doomed), prior_watermark=4)
    assert cleaned3.count() == 0 and wm3 == 7 and not qc3["non_empty"]


def test_backfill_slices_resume_and_match_single_pass(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.plans.etl import backfill

    df = _fixture(spark)
    run = IncrementalRun(watermark_col="row_id")
    loaded: list[tuple[int, list]] = []

    def load(cleaned, slice_id):
        loaded.append((slice_id, [r["row_id"] for r in cleaned.collect()]))

    state = str(tmp_path / "bf")
    res = backfill(run, df, lo=0, hi=6, num_slices=3, load=load, state_dir=state)
    assert [r["skipped"] for r in res] == [False, False, False]
    # slices are disjoint and their union equals the single-pass clean
    all_ids = sorted(i for _, ids in loaded for i in ids)
    want = sorted(r["row_id"] for r in clean_loan_data(df).where("row_id > 0 and row_id <= 6").collect())
    assert all_ids == want
    assert len(all_ids) == len(set(all_ids)), "slices must not overlap"

    # resume: nothing re-loads
    n_before = len(loaded)
    res2 = backfill(run, df, lo=0, hi=6, num_slices=3, load=load, state_dir=state)
    assert all(r["skipped"] for r in res2) and len(loaded) == n_before


def test_backfill_markers_keyed_by_range(spark, tmp_path):
    """Reusing a state_dir for a DIFFERENT range must not skip it."""
    from oltp_to_data_warehouse_pipeline_spark.plans.etl import backfill

    df = _fixture(spark)
    run = IncrementalRun(watermark_col="row_id")
    loaded = []
    state = str(tmp_path / "bf")
    backfill(run, df, lo=0, hi=3, num_slices=1, load=lambda d, i: loaded.append(("a", i)), state_dir=state)
    res = backfill(run, df, lo=3, hi=6, num_slices=1, load=lambda d, i: loaded.append(("b", i)), state_dir=state)
    assert not res[0]["skipped"]
    assert ("b", 0) in loaded


def test_backfill_qc_failure_stops_before_load(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.plans.etl import backfill

    df = _fixture(spark)
    # member_id nulls exist pre-clean; require uniqueness on a NON-unique
    # column to force a failing gate
    run = IncrementalRun(watermark_col="row_id", quality_keys=("term",))
    loaded = []
    res = backfill(
        run, df, lo=0, hi=6, num_slices=1,
        load=lambda d, i: loaded.append(i), state_dir=str(tmp_path / "bf"),
    )
    assert res[0].get("qc_failed"), res
    assert loaded == []  # nothing loaded, no marker written
