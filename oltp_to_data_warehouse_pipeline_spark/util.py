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


def md5_fold48(c, prefix: str = ""):
    """Engine-portable 48-bit hash: fold the first 12 hex chars of
    ``md5(prefix || CAST(c AS STRING))`` into a bigint.  The DuckDB twin is
    the per-hex-digit shift fold (see table_checksum_orders' oracle);
    ``prefix`` seeds independent hash functions (bloom bits, CMS rows,
    rolling checksums).  Single-sourced so a future fix to the fold (sign
    traps, width) lands once — it already appears in four operator
    families."""
    from pyspark.sql import functions as F

    col = F.col(c) if isinstance(c, str) else c
    s = col.cast("string")
    if prefix:
        s = F.concat(F.lit(prefix), s)
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("bigint")


def checkpoint_blocks(df: DataFrame):
    """The persisted RDD behind a ``localCheckpoint``'d DataFrame — the
    PRECISE release handle.  The checkpointed plan is a LogicalRDD wrapping
    the materialized blocks, so this never mis-attributes under concurrent
    queries (a before/after diff of the global persistent-RDD registry
    would — round-6 review finding)."""
    return df._jdf.queryExecution().analyzed().rdd()


def release_checkpoint(df: DataFrame) -> None:
    """Best-effort unpersist of a ``localCheckpoint``'d DataFrame's blocks.
    Safe to call more than once; never raises (cleanup must not mask the
    caller's control flow)."""
    try:
        checkpoint_blocks(df).unpersist(False)
    except Exception:  # noqa: BLE001
        pass
