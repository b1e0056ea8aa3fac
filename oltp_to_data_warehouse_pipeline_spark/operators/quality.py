"""Data-quality operators — the `quality_checks.py` surface, fixed.

Reference: `quality_checks.py:14-33` (null profile, row/distinct counts) with
SURVEY.md §2.10 B8 fixed (three separate distinct-count metrics, no
duplicate dict keys, no pandas in the data path).

Every profile here is ONE Spark job (a single agg over the table) — the
reference ran one job per metric; at 100 TB that difference is the whole
game.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A11 — per-column null counts, one row, one pass.

    `quality_checks.py:14-20` built a null-indicator matrix then describe();
    the set-oriented form is a single hash-agg: sum(isnull::int) per column.
    """
    cols = columns or df.columns
    return df.agg(
        *[F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"{c}_nulls") for c in cols]
    )


def distinct_profile(df: DataFrame, key_cols: list[str], approx: bool = False) -> DataFrame:
    """A2/A3 — total rows + per-key distinct counts (B8 fixed: one metric per
    key).  ``approx=True`` swaps in HyperLogLog (`approx_count_distinct`) —
    the right default at 100 TB where exact distinct forces a huge shuffle.
    """
    counter = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("total_rows")] + [
        counter(c).alias(f"unique_{c}") for c in key_cols
    ]
    return df.agg(*aggs)


def summary_stats(df: DataFrame, col: str) -> DataFrame:
    """A10 — describe() equivalent for one numeric column, deterministic
    column names/types (count/mean/stddev/min/max as a single row)."""
    c = F.col(col)
    return df.agg(
        F.count(c).alias("n"),
        F.round(F.avg(c), 4).alias("mean"),
        F.round(F.stddev_samp(c), 4).alias("stddev"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
    )


def fk_orphans(child: DataFrame, parent: DataFrame, fk: str, pk: str) -> DataFrame:
    """Referential-integrity probe: child rows whose non-null ``fk`` has no
    matching ``pk`` in parent.

    Left-anti join — at scale a shuffle keyed on the FK (or broadcast when
    the parent's key projection is small; Catalyst decides from stats).
    NULL FKs are excluded: SQL FK semantics treat NULL as 'not enforced'.
    """
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    return child.where(F.col(fk).isNotNull()).join(keys, fk, "left_anti")


def quality_gate(df: DataFrame, key_cols: list[str], not_null_cols: list[str]) -> dict[str, bool]:
    """Pipeline QC gate (the Airflow `perform_quality_checks` role,
    `Airflow.py:66-70`): uniqueness of keys + no nulls in required columns.

    Returns {check_name: passed}.  Collects only O(#checks) scalars.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in key_cols:
        aggs.append(F.countDistinct(c).alias(f"__uniq_{c}"))
    for c in not_null_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("int")).alias(f"__nulls_{c}"))
    row = df.agg(*aggs).first()
    results: dict[str, bool] = {"non_empty": row["__total"] > 0}
    for c in key_cols:
        results[f"unique_{c}"] = row[f"__uniq_{c}"] == row["__total"]
    for c in not_null_cols:
        results[f"no_nulls_{c}"] = (row[f"__nulls_{c}"] or 0) == 0
    return results


def observed(
    df: DataFrame,
    name: str,
    not_null_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
):
    """Attach free QC metrics to a pipeline: row count, per-column null
    counts, per-column sums, collected DURING the pipeline's own action via
    Spark's Observation API — zero extra passes over the data.

    The `quality_gate` above re-scans the table to profile it (fine as a
    standalone gate); at 100 TB the better pattern is observing the write
    itself: the metrics accumulate on executors while rows stream to the
    sink, and the driver reads O(#metrics) scalars afterwards.

    Returns (observed_df, observation).  Run an action on ``observed_df``
    (e.g. the warehouse write), then read ``observation.get`` — a dict like
    {"rows": n, "<col>_nulls": n, "<col>_sum": x}.  Contract caveat, per
    Spark semantics: ``get`` blocks until the FIRST action completes and
    reflects exactly the rows that action processed.
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in not_null_cols or []:
        metrics.append(F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"{c}_nulls"))
    for c in sum_cols or []:
        metrics.append(F.sum(F.col(c)).alias(f"{c}_sum"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
