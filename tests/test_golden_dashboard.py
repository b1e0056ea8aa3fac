"""Golden dashboard test (SURVEY §5): the A5-A9 query outputs over the
seeded loan fixture, frozen once — the synthetic analog of the
`DATA BI.pdf p.1` pins (1000 customers / 28M total / Fuel-dominant / 51-49
income split).  Any change to cleaning or aggregation semantics trips this.
"""

from __future__ import annotations

import pytest

import loan_fixture as lf
from oltp_to_data_warehouse_pipeline_spark.plans import dashboard
from oltp_to_data_warehouse_pipeline_spark.plans.etl import clean_loan_data


@pytest.fixture(scope="module")
def cleaned(spark):
    loans = clean_loan_data(lf.loan_df(spark)).cache()
    txns = clean_loan_data(lf.txn_df(spark)).cache()
    return loans, txns


def test_kpi_cards_golden(cleaned):
    loans, _ = cleaned
    row = dashboard.kpi_cards(loans).first()
    assert row["customers"] == 982            # 1001 raw - 1 dup - 18 null member_id
    assert row["total_loan_amount"] == 26797820.31
    assert row["max_annual_income"] == 99659.83
    assert row["min_annual_income"] == 0.0    # NULL/'n/a' incomes filled to 0


def test_by_employment_status_golden(cleaned):
    loans, _ = cleaned
    got = sorted(map(tuple, dashboard.by_employment_status(loans).collect()))
    assert got == [
        ("Employed", 18832861.61, 554.28, 700),
        ("Self-Employed", 5209750.29, 566.02, 184),
        ("Unemployed", 2755208.41, 552.0, 98),
    ]


def test_monthly_trend_golden(cleaned):
    loans, _ = cleaned
    got = [tuple(r) for r in dashboard.monthly_loan_trend(loans).collect()]
    assert [m for m, _ in got] == list(range(1, 13))       # calendar order, all months
    assert got[0] == (1, 2526455.31) and got[11] == (12, 2352249.74)


def test_txn_by_narration_golden(cleaned):
    _, txns = cleaned
    got = dict(map(tuple, dashboard.txn_by_narration(txns).collect()))
    assert got["Fuel Purchase"] == 9042480.72
    # PDF shape: Fuel dominates, the other six are within a tight band
    others = [v for k, v in got.items() if k != "Fuel Purchase"]
    assert len(others) == 6
    assert got["Fuel Purchase"] > 3 * max(others)
    assert max(others) / min(others) < 1.1


def test_txn_by_type_year_slicer_golden(cleaned):
    _, txns = cleaned
    got = dict(map(tuple, dashboard.txn_by_type(txns, year=2022).collect()))
    assert got == {"Expenditure": 3847475.57, "Monthly Income": 3891533.45}
    all_years = dict(map(tuple, dashboard.txn_by_type(txns).collect()))
    assert all_years["Monthly Income"] > all_years["Expenditure"]  # ≈51/49 split
