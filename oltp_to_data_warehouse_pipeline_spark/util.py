"""Small engine utilities shared across operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IF the input has fewer partitions than cores.

    CPU-heavy narrow operators (MinHash: k salted hashes per shingle; SimHash:
    one md5 per token) are bottlenecked by scan parallelism, and a compact
    parquet file with one row group yields a single input split no matter how
    many cores exist — the whole stage runs on one task.  The fix is a cheap
    round-robin exchange of the (small) input BEFORE the expensive map.

    The gate matters for scale: on a 100 TB input the scan already has
    thousands of splits (>= defaultParallelism), so this returns ``df``
    unchanged and no shuffle is added.  Only small/compact inputs — exactly
    the case where the exchange is cheap — are repartitioned.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def ensure_ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """Cast a TIMESTAMP_NTZ column to TIMESTAMP (exact under the engine's
    pinned-UTC session zone, session.py).

    The single shared implementation: catalog.load_table applies it at the
    table boundary, and the streaming helpers re-apply it defensively for
    DataFrames that didn't come through the catalog (watermarks and interval
    arithmetic require TIMESTAMP).  One definition, three call sites — a
    semantic change here cannot desynchronize them.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
