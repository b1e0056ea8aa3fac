"""Bucketed warehouse tables: co-located joins with zero exchanges.

Spark's native bucketing (``DataFrameWriter.bucketBy`` + ``saveAsTable``)
hash-partitions table FILES by the bucket key at write time.  Two tables
bucketed on their join key with the same bucket count sort-merge-join with
NO shuffle on either side — the physical property worth paying one write-
time shuffle for when a 100 TB fact table is joined on the same key every
day (the star schema's fact⋈dim and fact⋈fact patterns).

This complements `sources/upsert.py`'s directory-bucketing (which targets
incremental rewrite cost); here the target is repeated-join cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    ``sort=True`` additionally sorts each bucket file by the key, so the
    sort-merge join needs neither exchange NOR per-task sort on the read
    side.  ``num_buckets`` must match between co-joined tables.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    Hinted to sort-merge so Catalyst cannot pick a broadcast (which would
    mask the property being exploited); with matching bucket specs the plan
    has zero Exchange operators.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table).hint("merge")
    return left.join(right, on)
