"""Table reconciliation: row-level diff between two relations.

`table_checksum_orders` answers "are these tables equal?" without moving
rows; this operator answers the follow-up — "WHICH rows differ, and how?"
— the drill-down step of every OLTP↔warehouse reconciliation (the
engine-grade completion of the reference's row-count QC,
`quality_checks.py:22-33`).

Shape: one full-outer null-safe equi-join on the key, then per-row
classification into added / removed / changed.  Keyed shuffle on both
sides (co-partitioned by Catalyst); compared columns travel as a single
canonical struct so the change test is one null-safe struct equality, not
N per-column ORs.  At 100 TB run it per partition-range, or gate it behind
a checksum mismatch so equal partitions never join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Symmetric diff of ``right`` (new) against ``left`` (old).

    Returns one row per differing key: the key columns plus
    ``change`` ∈ {'added', 'removed', 'changed'} (added = key only in
    right, removed = only in left, changed = in both with differing
    ``compare_cols``).  Identical rows produce no output.  NULLs compare
    null-safely — NULL == NULL is "same", NULL vs value is a change.
    """
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    missing = [c for c in compare_cols if c not in right.columns]
    if missing:
        raise ValueError(f"compare_cols not in right side: {missing}")

    payload = F.struct(*[F.col(c) for c in compare_cols])
    l = left.select(*[F.col(c).alias(f"__lk_{c}") for c in keys], payload.alias("__l"))
    r = right.select(*[F.col(c).alias(f"__rk_{c}") for c in keys], payload.alias("__r"))
    # keys join null-safely too: a NULL-keyed row present identically on
    # both sides is "same", not a phantom removed+added pair
    cond = None
    for c in keys:
        eq = F.col(f"__lk_{c}").eqNullSafe(F.col(f"__rk_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = l.join(r, on=cond, how="full_outer")
    change = (
        F.when(F.col("__l").isNull(), F.lit("added"))
        .when(F.col("__r").isNull(), F.lit("removed"))
        .when(~F.col("__l").eqNullSafe(F.col("__r")), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__lk_{c}"), F.col(f"__rk_{c}")).alias(c)
                for c in keys
            ],
            "change",
        )
    )
