"""Recurring-schedule orchestration (plans/schedule.py) — the reference's
daily Airflow DAG semantics (`Airflow.py:11-23`): data-interval catchup,
crash-retry via the run ledger, exactly-once-per-logical-interval on top
of at-least-once triggering, and the watermark hand-off between runs."""

from __future__ import annotations

import pytest

from oltp_to_data_warehouse_pipeline_spark.plans import schedule as S

DAY = 86_400


def test_closed_interval_arithmetic():
    spec = S.ScheduleSpec(start=1_000_000, interval_s=DAY)
    assert spec.closed_intervals(1_000_000) == []
    assert spec.closed_intervals(1_000_000 + DAY - 1) == []
    assert spec.closed_intervals(1_000_000 + DAY) == [1_000_000]
    assert spec.closed_intervals(1_000_000 + 3 * DAY + 5) == [
        1_000_000,
        1_000_000 + DAY,
        1_000_000 + 2 * DAY,
    ]
    with pytest.raises(ValueError):
        S.ScheduleSpec(start=0, interval_s=0)


def test_catchup_runs_all_closed_intervals_in_order(spark, tmp_path):
    ledger = str(tmp_path / "ledger")
    spec = S.ScheduleSpec(start=0, interval_s=DAY)
    seen: list[tuple[int, dict]] = []

    def job(s, t, prior):
        seen.append((t, dict(prior)))
        return {"wm": t + 10}

    out = S.run_due(spark, spec, ledger, job, now=3 * DAY)
    assert out["ran"] == [0, DAY, 2 * DAY] and out["failed"] is None
    # logical order, and each run received the PREVIOUS success's state
    assert seen == [(0, {}), (DAY, {"wm": 10}), (2 * DAY, {"wm": DAY + 10})]
    # re-trigger at the same clock: nothing due — exactly-once per interval
    seen.clear()
    out2 = S.run_due(spark, spec, ledger, job, now=3 * DAY)
    assert out2["ran"] == [] and seen == []
    # the clock advances one day: exactly one more run, prior state carried
    out3 = S.run_due(spark, spec, ledger, job, now=4 * DAY + 1)
    assert out3["ran"] == [3 * DAY]
    assert seen == [(3 * DAY, {"wm": 2 * DAY + 10})]


def test_failure_stops_catchup_and_retries_next_trigger(spark, tmp_path):
    ledger = str(tmp_path / "ledger")
    spec = S.ScheduleSpec(start=0, interval_s=DAY)
    boom = {"fail_on": DAY}

    def job(s, t, prior):
        if t == boom["fail_on"]:
            raise RuntimeError("transient")
        return {"wm": t}

    out = S.run_due(spark, spec, ledger, job, now=3 * DAY)
    assert out["ran"] == [0] and out["failed"] == DAY
    # the failed interval AND everything after stay due; the failure row
    # records the traceback
    led = S.read_ledger(spark, ledger).collect()
    errs = [r for r in led if r["status"] == "failure"]
    assert len(errs) == 1 and "transient" in errs[0]["error"]
    # next trigger: the flake is gone — catchup resumes IN ORDER from the
    # failed interval
    boom["fail_on"] = -1
    out2 = S.run_due(spark, spec, ledger, job, now=3 * DAY)
    assert out2["ran"] == [DAY, 2 * DAY] and out2["failed"] is None
    state = S.ledger_state(spark, ledger)
    assert all(state[t][0] == "success" for t in (0, DAY, 2 * DAY))


def test_max_runs_bounds_one_trigger(spark, tmp_path):
    ledger = str(tmp_path / "ledger")
    spec = S.ScheduleSpec(start=0, interval_s=DAY)
    out = S.run_due(
        spark, spec, ledger, lambda s, t, p: {}, now=10 * DAY, max_runs=4
    )
    assert out["ran"] == [0, DAY, 2 * DAY, 3 * DAY]
    out2 = S.run_due(
        spark, spec, ledger, lambda s, t, p: {}, now=10 * DAY, max_runs=100
    )
    assert len(out2["ran"]) == 6  # the remaining closed intervals


def test_daily_etl_watermark_handoff_end_to_end(spark, tmp_path):
    """The reference DAG's actual task chain, scheduled: each logical day
    extracts only the delta past the prior day's watermark (carried by the
    ledger, not a fact-table scan), cleans, QC-gates, and appends — two
    scheduled days process disjoint slices and a replayed trigger appends
    nothing."""
    from oltp_to_data_warehouse_pipeline_spark.plans.etl import (
        IncrementalRun,
        LoanCleaningConfig,
    )

    src_path = str(tmp_path / "oltp")
    wh_path = str(tmp_path / "wh")
    ledger = str(tmp_path / "ledger")
    schema = "src_seq long, member_id string, Loan_Amount string"
    spark.createDataFrame(
        [(1, "M1", "100.0"), (2, "M2", "200.0")], schema
    ).write.parquet(src_path)

    pipeline = IncrementalRun(
        watermark_col="src_seq",
        quality_not_null=("member_id",),
        cleaning_cfg=LoanCleaningConfig(
            amount_cols=("Loan_Amount",), abs_cols=(), date_cols=(),
            emp_length_col=None, int_fill_cols=(),
        ),
    )

    def job(s, logical_ts, prior):
        source = s.read.parquet(src_path)
        cleaned, wm, qc = pipeline.run(source, prior.get("wm"))
        assert all(qc.values()), qc
        cleaned.write.mode("append").parquet(wh_path)
        return {"wm": wm}

    spec = S.ScheduleSpec(start=0, interval_s=DAY)
    out = S.run_due(spark, spec, ledger, job, now=DAY + 1)
    assert out["ran"] == [0]
    assert spark.read.parquet(wh_path).count() == 2

    # day 2: new OLTP rows arrive; the scheduled run extracts ONLY them
    spark.createDataFrame([(3, "M3", "300.0")], schema).write.mode(
        "append"
    ).parquet(src_path)
    out2 = S.run_due(spark, spec, ledger, job, now=2 * DAY + 1)
    assert out2["ran"] == [DAY]
    rows = {r["src_seq"] for r in spark.read.parquet(wh_path).collect()}
    assert rows == {1, 2, 3} and spark.read.parquet(wh_path).count() == 3
    # replayed trigger: at-least-once timer, exactly-once table state
    out3 = S.run_due(spark, spec, ledger, job, now=2 * DAY + 1)
    assert out3["ran"] == [] and spark.read.parquet(wh_path).count() == 3
    # the ledger carried the watermark forward
    state = S.ledger_state(spark, ledger)
    assert state[DAY][1]["wm"] == 3
