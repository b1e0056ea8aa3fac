"""Idempotent last-writer-wins upsert on plain parquet.

The reference upserts row-at-a-time with ``INSERT … ON CONFLICT DO UPDATE``
(`mongo_postgres_cdc.py:359-380`).  The Spark-native equivalent without an
ACID table format is *bucketed recompaction*:

- the table is laid out partitioned by ``__bucket = pmod(xxhash64(key), N)``;
- an incoming batch is deduped (LWW) and bucketed the same way;
- only the buckets present in the batch are read back, merged, and
  dynamically overwritten (``partitionOverwriteMode=dynamic``).

Cost per batch ∝ (touched buckets) × (bucket size), not table size — the
property that makes this viable at 100 TB: with N≈8192 buckets a batch
touching 1% of keys rewrites ~1% of the table.  Exactly-once *effect* comes
from idempotence: re-applying a batch (at-least-once delivery, ST3) yields
the same table state because LWW dedup is applied across old+new rows with a
deterministic ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark import fs
from oltp_to_data_warehouse_pipeline_spark.operators.dedup import lww_dedup

BUCKET_COL = "__bucket"


def _bucketed(df: DataFrame, key: str, num_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(num_buckets)))


def upsert_parquet(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str,
    order_cols: list[str],
    num_buckets: int = 64,
) -> None:
    """LWW-upsert ``batch`` into the parquet table at ``path``.

    ``order_cols``: descending-priority recency columns (e.g. updated_at,
    kafka offset); rows still tied after those are broken by a hash of the
    FULL row content, so the winner is deterministic under repartitioning
    and replay (the idempotence guarantee needs this — a per-run arbitrary
    winner would make replays flip values).

    Delete events (CDC tombstones, e.g. a Debezium ``op='d'``): mark the
    batch row with a boolean column and filter at read time with
    ``read_upserted(..., delete_col=...)``.  Tombstones compete in LWW like
    any write and are RETAINED physically — that is what makes a stale
    replay of a pre-delete update a no-op (the tombstone still outranks it)
    instead of a resurrection.  A delete followed by a newer insert
    re-surfaces the key, because the insert outranks the tombstone.
    """

    def order_for(df: DataFrame) -> list:
        content = F.xxhash64(*[F.col(c) for c in sorted(df.columns)])
        return [F.col(c).desc() for c in order_cols] + [content.desc()]

    incoming = _bucketed(lww_dedup(batch, [key], order_for(batch)), key, num_buckets)

    # Hadoop-FS existence (not os.path): the table may live on s3a://hdfs://,
    # where a driver-local check would wrongly take the fresh-table branch
    # and overwrite the store.
    if not fs.has_data_files(spark, path):
        (
            incoming.repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
        return

    existing = spark.read.option("mergeSchema", "true").parquet(path)
    touched = [r[BUCKET_COL] for r in incoming.select(BUCKET_COL).distinct().collect()]
    # partition pruning: only touched buckets are scanned
    relevant = existing.where(F.col(BUCKET_COL).isin(touched))
    # schema evolution (B9 fixed): allowMissingColumns unions additively
    unioned = relevant.unionByName(incoming, allowMissingColumns=True)
    merged = lww_dedup(unioned, [key], order_for(unioned))
    (
        merged.repartition(BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def scd2_upsert_parquet(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key: str,
    tracked: list[str],
    eff_col: str,
    num_buckets: int = 64,
) -> None:
    """Maintain an SCD Type 2 dimension on bucketed parquet from CDC batches
    (the ``foreachBatch`` body for a versioned-dimension sink — the Type-2
    counterpart of :func:`upsert_parquet`'s Type-1 LWW).

    ``batch`` carries the dimension attribute schema plus ``eff_col`` (each
    change's event date).  Within a micro-batch only the LATEST change per
    key is applied (ordered by ``eff_col``, ties broken by full-row content
    hash) — sub-batch intermediate versions collapse, the same granularity
    trade every micro-batched CDC consumer makes.  Merge mechanics and
    economics are inherited from the bucketed layout: only buckets touched
    by the batch are read back, merged through
    :func:`~oltp_to_data_warehouse_pipeline_spark.operators.scd.scd2_apply`,
    and dynamically overwritten — cost ∝ touched buckets, never table size,
    and history rows stay co-bucketed with their key.

    Idempotent under replay (at-least-once → exactly-once effect): a
    re-delivered batch finds every change already current, the null-safe
    change detection reports no differences, and the merge is a no-op.
    """
    from oltp_to_data_warehouse_pipeline_spark.operators.scd import scd2_apply, scd2_init

    content = F.xxhash64(*[F.col(c) for c in sorted(batch.columns)])
    latest = lww_dedup(batch, [key], [F.col(eff_col).desc(), content.desc()])

    if not fs.has_data_files(spark, path):
        # first batch: every row is an insert, open from its own event date
        attrs = [c for c in latest.columns if c != eff_col]
        empty_dim = scd2_init(latest.select(*attrs).limit(0))
        first = scd2_apply(empty_dim, latest, key, tracked, eff_col=eff_col)
        (
            _bucketed(first, key, num_buckets)
            .repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(path)
        )
        return

    incoming = _bucketed(latest, key, num_buckets)
    existing = spark.read.parquet(path)
    touched = [r[BUCKET_COL] for r in incoming.select(BUCKET_COL).distinct().collect()]
    relevant = existing.where(F.col(BUCKET_COL).isin(touched)).drop(BUCKET_COL)
    merged = scd2_apply(relevant, latest, key, tracked, eff_col=eff_col)
    (
        _bucketed(merged, key, num_buckets)
        .repartition(BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def read_scd2(spark: SparkSession, path: str, current_only: bool = False) -> DataFrame:
    """Read the versioned dimension (drops the physical bucket column).
    ``current_only`` gives the Type-1 view (open versions only)."""
    df = spark.read.parquet(path).drop(BUCKET_COL)
    return df.where(F.col("is_current") == 1) if current_only else df


def compact_tombstones(
    spark: SparkSession,
    path: str,
    delete_col: str,
    order_col: str,
    horizon,
) -> None:
    """Physically purge tombstones older than ``horizon`` (the replay
    horizon: once no producer can re-deliver a pre-delete write, the
    tombstone no longer protects anything and is pure dead weight).

    Rewrites every bucket that holds an expired tombstone — run this on the
    maintenance cadence, not per batch.
    """
    existing = spark.read.option("mergeSchema", "true").parquet(path)
    if delete_col not in existing.columns:
        return
    expired = F.coalesce(F.col(delete_col), F.lit(False)) & (F.col(order_col) <= F.lit(horizon))
    touched = [
        r[BUCKET_COL]
        for r in existing.where(expired).select(BUCKET_COL).distinct().collect()
    ]
    if not touched:
        return
    kept = existing.where(F.col(BUCKET_COL).isin(touched)).where(~expired)
    kept_buckets = {r[BUCKET_COL] for r in kept.select(BUCKET_COL).distinct().collect()}
    if kept_buckets:
        (
            kept.repartition(BUCKET_COL)
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )
    # dynamic overwrite only rewrites partitions it writes rows into; a
    # bucket whose every row expired produces no output rows, so its stale
    # files must be removed explicitly
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for b in set(touched) - kept_buckets:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{BUCKET_COL}={b}")
        fs = p.getFileSystem(hconf)
        fs.delete(p, True)


def read_upserted(spark: SparkSession, path: str, delete_col: str | None = None) -> DataFrame:
    """Read the logical table (drops the physical bucket column).

    ``mergeSchema`` makes additively-evolved columns visible even when older
    buckets were written before the column existed (B9 fixed).

    ``delete_col``: name of the tombstone flag; keys whose LWW winner is a
    delete are hidden from the logical view (their tombstones stay in the
    physical files so replays of older updates cannot resurrect them —
    compact them away only once the replay horizon has passed).
    """
    df = spark.read.option("mergeSchema", "true").parquet(path).drop(BUCKET_COL)
    if delete_col is not None and delete_col in df.columns:
        df = df.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
    return df
