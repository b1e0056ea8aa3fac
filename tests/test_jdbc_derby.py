"""Real JDBC round-trip (S1/S3) against embedded Derby — the DB that ships
inside Spark's own jars, so no container installs.  Upgrades the JDBC
source/sink from plan-text-only coverage to behavior coverage: append sink,
full scan, pushed watermark delta, and partitioned parallel read."""

from __future__ import annotations

import pytest

from oltp_to_data_warehouse_pipeline_spark.sources.jdbc import (
    JdbcConfig,
    incremental_query,
    read_table,
    write_append,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def cfg(tmp_path):
    return JdbcConfig(url=f"jdbc:derby:{tmp_path}/db;create=true", driver=DRIVER)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS fact_id", "id * 10 AS amount", "CAST(id % 3 AS INT) AS bucket"
    )


def test_append_scan_watermark_and_partitioned_read(spark, cfg):
    write_append(_rows(spark, 0, 50), cfg, "facts")

    full = read_table(spark, cfg, "facts")
    assert full.count() == 50

    # S3 append is append, not overwrite
    write_append(_rows(spark, 50, 60), cfg, "facts")
    assert read_table(spark, cfg, "facts").count() == 60

    # P4: watermark delta pushed into the source query
    delta = read_table(spark, cfg, "facts", watermark_col="fact_id", watermark=54)
    got = sorted(r["fact_id"] for r in delta.collect())
    assert got == [55, 56, 57, 58, 59]

    # S1 parallel read: watermark + partition bounds (derived-table form)
    part = read_table(
        spark,
        cfg,
        "facts",
        watermark_col="fact_id",
        watermark=9,
        partition_column="fact_id",
        lower_bound=0,
        upper_bound=60,
        num_partitions=4,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 50
    assert part.agg({"fact_id": "min"}).first()[0] == 10


def test_incremental_query_text():
    assert incremental_query("t", "k", None) == "SELECT * FROM t"
    assert incremental_query("t", "k", 7) == 'SELECT * FROM t WHERE "k" > 7'


def test_full_lifecycle_oltp_to_warehouse_over_jdbc(spark, cfg):
    """SURVEY §3.1 end-to-end with a real DB on BOTH ends: seed OLTP in
    Derby -> watermark extract -> clean (spark_etl semantics) -> QC gate ->
    append to a Derby warehouse table -> second incremental run processes
    only the delta."""
    from oltp_to_data_warehouse_pipeline_spark.plans.etl import (
        IncrementalRun,
        LoanCleaningConfig,
    )

    oltp_rows = [
        # (src_seq, member_id, Loan_Amount, term, verification_status)
        (1, "M1", "1000.5", "36 months", "Verified"),
        (2, "M2", "junk", "60 months", None),       # junk amount -> 0.0, verif fill
        (3, None, "2000.0", "36 months", "Verified"),  # credit-policy filtered
    ]
    schema = "src_seq long, member_id string, Loan_Amount string, term string, verification_status string"
    write_append(spark.createDataFrame(oltp_rows, schema), cfg, "oltp_loans")

    pipeline = IncrementalRun(
        watermark_col="src_seq",
        quality_not_null=("member_id",),
        cleaning_cfg=LoanCleaningConfig(
            amount_cols=("Loan_Amount",), abs_cols=(), date_cols=(),
            emp_length_col=None, int_fill_cols=(),
        ),
    )

    src = read_table(spark, cfg, "oltp_loans")
    cleaned, wm, qc = pipeline.run(src, prior_watermark=None)
    assert wm == 3 and qc["no_nulls_member_id"] is True
    write_append(cleaned, cfg, "wh_loans")
    wh = read_table(spark, cfg, "wh_loans")
    got = {(r["src_seq"], r["Loan_Amount"], r["verification_status"]) for r in wh.collect()}
    assert got == {(1, 1000.5, "Verified"), (2, 0.0, "Not Verified")}

    # incremental: new OLTP rows beyond the watermark
    write_append(
        spark.createDataFrame([(4, "M4", "4000.0", "36 months", "Verified")], schema),
        cfg,
        "oltp_loans",
    )
    src2 = read_table(spark, cfg, "oltp_loans", watermark_col="src_seq", watermark=wm)
    cleaned2, wm2, _ = pipeline.run(src2, prior_watermark=wm)
    assert wm2 == 4 and cleaned2.count() == 1
    write_append(cleaned2, cfg, "wh_loans")
    assert read_table(spark, cfg, "wh_loans").count() == 3
