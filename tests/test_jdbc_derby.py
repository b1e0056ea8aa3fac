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
