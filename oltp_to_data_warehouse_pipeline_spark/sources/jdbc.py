"""JDBC source/sink wrappers — S1/S3 (`spark_etl.py:120-138,160-166`).

Spark-idiomatic improvements over the reference:
- the incremental predicate is pushed INTO the source via the ``query``
  option (the reference filtered after a full table read and relied on
  Catalyst pushdown saving it — §4);
- parallel reads via partitionColumn bounds, so a 1000-executor cluster
  opens 1000 cursors instead of 1.

Exercised end-to-end against embedded Derby (the JDBC database inside
Spark's own jars — tests/test_jdbc_derby.py): append sink, full scan,
pushed watermark delta, and partitioned parallel read.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    url: str
    user: str = ""
    password: str = ""
    driver: str = ""
    fetchsize: int = 10_000

    def apply(self, reader: DataFrameReader) -> DataFrameReader:
        reader = reader.option("url", self.url).option("fetchsize", str(self.fetchsize))
        if self.user:
            reader = reader.option("user", self.user).option("password", self.password)
        if self.driver:
            reader = reader.option("driver", self.driver)
        return reader


def incremental_query(table: str, watermark_col: str, watermark: int | None) -> str:
    """The pushed-down delta extract (P4, B5 fixed: source-side key).

    The COLUMN is ANSI-quoted: Spark's JDBC writer emits column names quoted
    (case-preserved), so an unquoted predicate case-folds on the server
    (Derby→upper, Postgres→lower) and misses the column — caught by the
    embedded-Derby round-trip test.  The TABLE name is passed through
    verbatim: the writer emits it unquoted (server-folded), and callers who
    created case-sensitive tables can pass their own quoting.
    """
    if watermark is None:
        return f"SELECT * FROM {table}"
    return f'SELECT * FROM {table} WHERE "{watermark_col}" > {int(watermark)}'


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    watermark_col: str | None = None,
    watermark: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """S1 — JDBC scan with optional pushed watermark + parallel partitioning.

    Spark forbids combining the ``query`` option with ``partitionColumn``,
    so when BOTH a watermark and partition bounds are requested the pushed
    predicate is expressed as a ``dbtable`` derived-table subquery instead
    (same server-side execution, legal with partitioned reads).
    """
    reader = cfg.apply(spark.read.format("jdbc"))
    partitioned = partition_column and lower_bound is not None and upper_bound is not None
    if watermark_col is not None and partitioned:
        sub = incremental_query(table, watermark_col, watermark)
        # plain alias: identifiers with a leading underscore are illegal
        # unquoted in some engines (Derby)
        reader = reader.option("dbtable", f"({sub}) AS delta_src")
    elif watermark_col is not None:
        reader = reader.option("query", incremental_query(table, watermark_col, watermark))
    else:
        reader = reader.option("dbtable", table)
    if partitioned:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_append(df: DataFrame, cfg: JdbcConfig, table: str, batchsize: int = 10_000) -> None:
    """S3 — append sink (`spark_etl.py:160-166`); executors stream rows out
    per partition."""
    writer = df.write.format("jdbc").mode("append").option("dbtable", table)
    writer = writer.option("url", cfg.url).option("batchsize", str(batchsize))
    if cfg.user:
        writer = writer.option("user", cfg.user).option("password", cfg.password)
    if cfg.driver:
        writer = writer.option("driver", cfg.driver)
    writer.save()
