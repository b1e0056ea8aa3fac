"""The dashboard analytic query set — `DATA BI.pdf p.1` shapes (A5-A9).

These run over the *cleaned* loan-domain tables (plans.etl output or any
frame with the same columns).  Column bindings are parameters so the same
queries serve the loan fixtures (FIXTURES.md §B) and ad-hoc tables.  Golden
values for the synthetic fixture are frozen in tests/test_golden_dashboard.py
— the analog of the PDF's 1000/28M/686-213-101 pins (SURVEY §5/§6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kpi_cards(loans: DataFrame, income_col: str = "Annual_Income", amount_col: str = "Loan_Amount") -> DataFrame:
    """A9 — Customers / Total Loan / Max+Min Annual Income cards."""
    return loans.agg(
        F.count(F.lit(1)).alias("customers"),
        F.round(F.sum(amount_col), 2).alias("total_loan_amount"),
        F.round(F.max(income_col), 2).alias("max_annual_income"),
        F.round(F.min(income_col), 2).alias("min_annual_income"),
    )


def by_employment_status(
    loans: DataFrame,
    status_col: str = "Employment_Status",
    amount_col: str = "Loan_Amount",
    score_col: str = "Credit_Score",
) -> DataFrame:
    """A5 + A6 — Loan Amount sum, Credit Score avg, customer count by status."""
    return loans.groupBy(F.col(status_col).alias("employment_status")).agg(
        F.round(F.sum(amount_col), 2).alias("total_loan_amount"),
        F.round(F.avg(score_col), 2).alias("avg_credit_score"),
        F.count(F.lit(1)).alias("customers"),
    )


def monthly_loan_trend(loans: DataFrame, date_col: str = "Loan_Application_Date", amount_col: str = "Loan_Amount") -> DataFrame:
    """A7 — monthly Loan Amount trend in calendar order."""
    return (
        loans.groupBy(F.month(date_col).alias("month"))
        .agg(F.round(F.sum(amount_col), 2).alias("total_loan_amount"))
        .orderBy("month")
    )


def txn_by_narration(
    txns: DataFrame,
    narration_col: str = "Narration",
    amount_col: str = "Transaction_Amount_updated",
    year: int | None = None,
    date_col: str = "Transaction_Date",
) -> DataFrame:
    """A8 — abs-amount sums by Narration, optional Year slicer."""
    src = txns.where(F.year(date_col) == year) if year is not None else txns
    return src.groupBy(F.col(narration_col).alias("narration")).agg(
        F.round(F.sum(amount_col), 2).alias("total_amount")
    )


def txn_by_type(
    txns: DataFrame,
    type_col: str = "Transaction_Type",
    amount_col: str = "Transaction_Amount_updated",
    year: int | None = None,
    date_col: str = "Transaction_Date",
) -> DataFrame:
    """A8 — Monthly Income vs Expenditure split, optional Year slicer."""
    src = txns.where(F.year(date_col) == year) if year is not None else txns
    return src.groupBy(F.col(type_col).alias("transaction_type")).agg(
        F.round(F.sum(amount_col), 2).alias("total_amount")
    )
