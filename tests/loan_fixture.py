"""Deterministic loan-domain fixture generator (FIXTURES.md §B1/§B2).

Pure-Python LCG (seeded) so the goldens in test_golden_dashboard.py are
stable across machines/runs — the synthetic analog of the reference's
private dataset pinned by `DATA BI.pdf p.1`.
"""

from __future__ import annotations

N_CUSTOMERS = 1000
TXNS_PER_CUSTOMER = 8

STATUSES = ["Employed"] * 69 + ["Self-Employed"] * 21 + ["Unemployed"] * 10
NARRATIONS = [
    "Fuel Purchase", "Bill Payment", "ATM Withdrawal", "Grocery Shopping",
    "POS Purchase", "Online Transfer", "Restaurant Bill",
]
EMP_LENGTHS = ["10+ years", "< 1 year", "2 years", "5 years", "8 years", None]
VERIFICATION = ["Verified", "Source Verified", None]


class _LCG:
    def __init__(self, seed: int = 42):
        self.state = seed or 1

    def next(self) -> int:
        self.state = (self.state * 48271) % 2147483647
        return self.state

    def pick(self, seq):
        return seq[self.next() % len(seq)]

    def uniform(self, lo: float, hi: float) -> float:
        return lo + (self.next() / 2147483647.0) * (hi - lo)


def loan_rows():
    """~1000 loan applications with the §B1 dirtiness mix."""
    rng = _LCG(42)
    rows = []
    for i in range(N_CUSTOMERS):
        cust = f"CUST{i:05d}"
        member = None if rng.next() % 50 == 0 else f"M{i:05d}"          # ~2% NULL
        income = (
            None if rng.next() % 33 == 0
            else "n/a" if rng.next() % 100 == 0
            else str(round(rng.uniform(490, 99963), 2))
        )
        amount = "junk" if rng.next() % 100 == 0 else str(round(rng.uniform(5000, 51000), 2))
        month = rng.next() % 12 + 1
        day = rng.next() % 28 + 1
        year = 2021 + rng.next() % 3
        rows.append(
            (
                cust,
                f"APP{i:05d}",
                member,
                int(rng.uniform(300, 850)),
                rng.pick(STATUSES),
                rng.pick(EMP_LENGTHS),
                income,
                amount,
                rng.pick([" 36 months", " 60 months"]),
                rng.pick(VERIFICATION),
                str(rng.next() % 5) if rng.next() % 20 else None,        # ~5% NULL
                f"{year:04d}-{month:02d}-{day:02d}",
            )
        )
    rows.append(rows[0])  # ~0.1% exact duplicate (exercises dropDuplicates)
    return rows


LOAN_COLS = [
    "Customer_ID", "Application_ID", "member_id", "Credit_Score",
    "Employment_Status", "emp_length", "Annual_Income", "Loan_Amount",
    "term", "verification_status", "delinq_2yrs", "Loan_Application_Date",
]


def txn_rows():
    """~8000 bank-statement transactions with the §B2 mix."""
    rng = _LCG(4242)
    rows = []
    for i in range(N_CUSTOMERS * TXNS_PER_CUSTOMER):
        cust = f"CUST{(rng.next() % N_CUSTOMERS):05d}"
        narration = rng.pick(NARRATIONS)
        txn_type = "Monthly Income" if rng.next() % 100 < 51 else "Expenditure"
        amt = round(rng.uniform(10, 4000), 2)
        if narration == "Fuel Purchase":
            amt = round(amt * 4, 2)                                     # Fuel dominates (PDF shape)
        if txn_type == "Expenditure" and rng.next() % 5 < 2:
            amt = -amt                                                  # ~40% negative debits
        month = rng.next() % 12 + 1
        day = rng.next() % 28 + 1
        year = 2021 + rng.next() % 3
        balance = None if rng.next() % 40 == 0 else round(rng.uniform(-2000, 90000), 2)
        rows.append(
            (
                f"TXN{i:06d}", cust, f"{year:04d}-{month:02d}-{day:02d}",
                str(amt), balance, narration, txn_type,
            )
        )
    return rows


TXN_COLS = [
    "Transaction_ID", "Customer_ID", "Transaction_Date", "Transaction_Amount",
    "Balance", "Narration", "Transaction_Type",
]


def loan_df(spark):
    return spark.createDataFrame(loan_rows(), LOAN_COLS)


def txn_df(spark):
    return spark.createDataFrame(txn_rows(), TXN_COLS)
