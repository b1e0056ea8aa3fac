"""The batch ETL pipeline — `spark_etl.py`'s flagship path, composed.

Lifecycle (SURVEY §3.1, intended task order from `Airflow.py:73` / B10):
watermark → incremental extract → clean/transform → QC gate → load.

The cleaning stage reproduces the reference's loan-domain rules
(`spark_etl.py:29-95`) as a declarative rule list over configurable column
names, so the same pipeline runs on the loan fixtures (FIXTURES.md §B) or
any conforming table.  One narrow projection per rule chain — the only
shuffle in the whole pipeline is dropDuplicates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.functions import cleaning


@dataclass(frozen=True)
class LoanCleaningConfig:
    """Column bindings for the spark_etl cleaning semantics."""

    amount_cols: tuple[str, ...] = ("Loan_Amount", "Annual_Income", "Transaction_Amount", "Balance")
    abs_cols: tuple[str, ...] = ("Transaction_Amount", "Balance")
    date_cols: tuple[str, ...] = ("Loan_Application_Date", "Transaction_Date")
    emp_length_col: str | None = "emp_length"
    term_col: str | None = "term"
    verification_col: str | None = "verification_status"
    required_col: str | None = "member_id"
    int_fill_cols: tuple[str, ...] = ("delinq_2yrs", "inq_last_6mths")
    na_tokens: tuple[str, ...] = ("n/a",)


def clean_loan_data(df: DataFrame, cfg: LoanCleaningConfig = LoanCleaningConfig()) -> DataFrame:
    """The full `clean_and_transform_data` chain (`spark_etl.py:149-156`),
    intended semantics (B1 fixed), order-preserved:

    numeric coercion+fill (F1/F8) → date casts (F3) → abs-normalize (F4,
    producing ``<col>_updated``) → dedup (D1) → 'n/a' scrub (F10) →
    emp-length recode (F5/F6) → term substring (F7) → verification fill
    (F9) → int coercion+fill → credit-policy filter (P3).
    """
    cols = set(df.columns)
    out = df

    present_amounts = [c for c in cfg.amount_cols if c in cols]
    for c in present_amounts:
        out = out.withColumn(c, cleaning.cast_double(c))
    out = cleaning.fill_nulls(out, numeric_zero=present_amounts)

    for c in (c for c in cfg.date_cols if c in cols):
        out = out.withColumn(c, cleaning.cast_date(c))

    for c in (c for c in cfg.abs_cols if c in cols):
        out = out.withColumn(f"{c}_updated", cleaning.abs_amount(c))

    out = out.dropDuplicates()
    out = cleaning.replace_na_tokens(out, cfg.na_tokens)

    if cfg.emp_length_col and cfg.emp_length_col in cols:
        out = out.withColumn(cfg.emp_length_col, cleaning.emp_length_recode(cfg.emp_length_col))
    if cfg.term_col and cfg.term_col in cols:
        out = out.withColumn(cfg.term_col, cleaning.leading_int(cfg.term_col, 2))
    if cfg.verification_col and cfg.verification_col in cols:
        out = cleaning.fill_nulls(out, string_fills={cfg.verification_col: "Not Verified"})

    present_ints = [c for c in cfg.int_fill_cols if c in cols]
    for c in present_ints:
        out = out.withColumn(c, cleaning.cast_int(c))
    out = cleaning.fill_nulls(out, numeric_zero=present_ints)

    if cfg.required_col and cfg.required_col in cols:
        out = cleaning.not_null_filter(out, cfg.required_col)
    return out


@dataclass
class IncrementalRun:
    """One watermark-driven pipeline run (the Airflow DAG's task chain)."""

    watermark_col: str
    quality_keys: tuple[str, ...] = ()
    quality_not_null: tuple[str, ...] = ()
    cleaning_cfg: LoanCleaningConfig = field(default_factory=LoanCleaningConfig)

    def run(self, source: DataFrame, prior_watermark: int | None) -> tuple[DataFrame, int | None, dict[str, bool]]:
        """extract → transform → QC; returns (cleaned delta, new watermark,
        qc results).  The caller owns the load step (sink choice)."""
        from oltp_to_data_warehouse_pipeline_spark.operators.quality import quality_gate

        delta = cleaning.watermark_delta(source, self.watermark_col, prior_watermark)
        cleaned = clean_loan_data(delta, self.cleaning_cfg)
        # advance the watermark from the RAW delta, not the cleaned frame: a
        # delta whose rows all fail cleaning must still move the watermark
        # (else the next run re-extracts — and re-appends — the whole range);
        # and an empty delta keeps the prior watermark instead of resetting
        # to None (which would mean "full re-extract" downstream).
        row = delta.agg(F.max(self.watermark_col).alias("m")).first()
        new_watermark = row["m"] if row and row["m"] is not None else prior_watermark
        qc = quality_gate(
            cleaned, list(self.quality_keys), list(self.quality_not_null)
        ) if (self.quality_keys or self.quality_not_null) else {"non_empty": cleaned.limit(1).count() > 0}
        return cleaned, new_watermark, qc


def backfill(
    run: IncrementalRun,
    source: DataFrame,
    lo: int,
    hi: int,
    num_slices: int,
    load,
    state_dir: str,
) -> list[dict]:
    """Historical replay of a key range in bounded slices — the operation
    the reference has no answer for (its only modes are "incremental from
    watermark" and "rebuild everything", `spark_etl.py:118-146`,
    `DB.sql:24,51`).

    The range (lo, hi] splits into ``num_slices`` half-open slices; each
    slice runs extract→clean→QC exactly like a watermark increment (both
    slice bounds push into the scan; the run's quality gate judges every
    slice and a failing slice STOPS the backfill before its load, exactly
    like the incremental path's QC-gates-load ordering) and hands the
    cleaned delta to ``load(df, slice_id)``.  A completion marker per slice
    — keyed by the (lo, hi, num_slices) range so a reused state_dir cannot
    silently skip a DIFFERENT range — makes an interrupted backfill
    resumable without double-loading: re-running skips finished slices (for
    mid-slice crashes the sink must be idempotent per slice — the same
    contract every sink in this engine already honors).

    Slicing bounds peak resource usage (each slice shuffles/loads its own
    fraction) and gives linear progress checkpoints — at 100 TB an
    unsliced backfill is one giant all-or-nothing job.  Returns one status
    dict per slice.
    """
    from oltp_to_data_warehouse_pipeline_spark import fs
    from oltp_to_data_warehouse_pipeline_spark.operators.quality import quality_gate

    spark = source.sparkSession
    if num_slices < 1 or hi <= lo:
        raise ValueError("need hi > lo and num_slices >= 1")
    fs.mkdirs(spark, state_dir)
    range_key = f"{lo}_{hi}_{num_slices}"
    width = (hi - lo) / num_slices
    results: list[dict] = []
    for i in range(num_slices):
        s_lo = lo + int(i * width)
        s_hi = hi if i == num_slices - 1 else lo + int((i + 1) * width)
        marker = fs.join(state_dir, f"slice_{range_key}_{i:05d}")
        if fs.exists(spark, marker):
            results.append({"slice": i, "lo": s_lo, "hi": s_hi, "skipped": True})
            continue
        delta = source.where(
            (F.col(run.watermark_col) > s_lo) & (F.col(run.watermark_col) <= s_hi)
        )
        cleaned = clean_loan_data(delta, run.cleaning_cfg)
        gated = bool(run.quality_keys or run.quality_not_null)
        if gated:
            # the gate is its own action; persist so gate + load share one
            # extract->clean computation instead of scanning the slice twice
            cleaned = cleaned.persist()
            qc = quality_gate(
                cleaned, list(run.quality_keys), list(run.quality_not_null)
            )
            # an empty slice is fine (sparse key ranges); any OTHER failed
            # gate poisons the backfill — stop before loading bad data
            bad = [k for k, ok in qc.items() if not ok and k != "non_empty"]
            if bad:
                cleaned.unpersist()
                results.append(
                    {"slice": i, "lo": s_lo, "hi": s_hi, "skipped": False,
                     "qc_failed": bad}
                )
                return results
        load(cleaned, i)
        if gated:
            cleaned.unpersist()
        fs.touch(spark, marker)
        results.append({"slice": i, "lo": s_lo, "hi": s_hi, "skipped": False})
    return results
