"""Streaming KMV sketch-store maintenance: the "stored day sketches" the
batch rollups serve from, kept current by the stream itself.

`kmv_rolling_7d_users`'s 100 TB story is that arbitrary date-window
distinct counts are served by MERGING stored per-day sketches (k rows per
day) instead of re-shuffling raw events per window.  This module maintains
that store incrementally: each micro-batch is sketched per day
(:func:`operators.kmv.kmv_sketch` — O(k) rows per day on the exchange),
merged with the stored sketches of exactly the days the batch touched, and
the affected day PARTITIONS are overwritten in place (dynamic partition
overwrite — untouched days are never rewritten, so per-batch IO is
O(days-in-batch × k), independent of history length).

Replay safety comes from the merge itself: re-sketching a union that
already contains a batch's hashes returns the identical k-minimum set, so
a re-delivered micro-batch overwrites a day partition with the SAME rows —
idempotence without a batch-id ledger, the same argument as
streaming/corpus.py's dedup-predicate guard (and unlike matview.
maintain_rollup, whose SUM merge needs a journal: minima are idempotent,
sums are not).

At-least-once contract (ST3, the reference consumer's replay semantics —
mongo_postgres_cdc.py:429-456): a crash between the partition overwrite
and the checkpoint commit re-delivers the batch; the merge converges to
the same store, verified by the from-scratch-replay test.

Serving: :func:`window_estimate` answers "distinct keys in [start, end]"
from the store alone — a ≤ k·days-row scan with day-partition pruning,
never the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from oltp_to_data_warehouse_pipeline_spark import fs
from oltp_to_data_warehouse_pipeline_spark.operators import kmv
from oltp_to_data_warehouse_pipeline_spark.util import release_checkpoint


def merge_batch_into_store(
    batch: DataFrame,
    store_path: str,
    key_col: str,
    ts_col: str,
    k: int,
) -> None:
    """One micro-batch step: sketch the batch per day, merge with the
    stored sketches of the SAME days, overwrite those day partitions.

    The merged relation is ≤ k rows per touched day (sketch-sized), and
    the read side prunes to touched days via the semi join on a ≤
    days-in-batch key set — with the store partitioned by ``d``, that is
    partition pruning, not a scan."""
    spark = batch.sparkSession
    # Rows with a NULL/uncastable timestamp have no day — they cannot live
    # in a day-partitioned store (a NULL partition would also dodge the
    # touched-days pruning below), so they are excluded explicitly.
    days = batch.withColumn("d", F.col(ts_col).cast("date")).where(
        F.col("d").isNotNull()
    )
    # Pin the sketch: it feeds BOTH the touched-day broadcast and the
    # merge union, and Spark would otherwise run the whole sketch build
    # (HLL pass, threshold join, distinct, rank) twice per micro-batch.
    # Sketch-sized (≤ k rows per day in the batch), so always safe.
    pinned = kmv.kmv_sketch(days, key_col, ["d"], k=k, prefilter=True).localCheckpoint(
        eager=True
    )
    try:
        fresh = pinned
        if fs.has_data_files(spark, store_path):
            touched = fresh.select("d").distinct()
            stored = (
                spark.read.parquet(store_path)
                .join(F.broadcast(touched), "d", "left_semi")
                .select("d", "h")
            )
            fresh = kmv.kmv_merge(fresh.unionByName(stored), ["d"], k=k)
        (
            fresh.select("h", "d")  # partition column last, house layout
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("d")
            .parquet(store_path)
        )
    finally:
        # A long-running stream calls this every micro-batch: drop the
        # checkpoint blocks NOW, or they accumulate for the stream's life.
        release_checkpoint(pinned)


def maintain_kmv_store(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 64,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach the sketch-store maintainer to an event stream."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        merge_batch_into_store(batch, store_path, key_col, ts_col, k)

    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .queryName("kmv-sketch-store")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def window_estimate(
    spark: SparkSession,
    store_path: str,
    start: str,
    end: str,
    k: int = 64,
) -> DataFrame:
    """One row ``(est_distinct)``: distinct keys over [start, end], served
    ENTIRELY from stored day sketches — k rows per day in, one merged
    sketch out, raw data never touched.  The date filter prunes store
    partitions before any read.  ALWAYS one row: an absent store or a
    range covering no stored days answers 0, not an empty relation (the
    contract a dashboard caller indexes into)."""
    zero = spark.createDataFrame([(0,)], "est_distinct bigint")
    if not fs.has_data_files(spark, store_path):
        return zero
    sk = (
        spark.read.parquet(store_path)
        .where((F.col("d") >= F.lit(start)) & (F.col("d") <= F.lit(end)))
        .select(F.lit(1).alias("g"), F.col("h"))
    )
    merged = kmv.kmv_merge(sk.select("g", "h"), ["g"], k=k)
    est = kmv.kmv_estimate(merged, ["g"], k=k).select("est_distinct")
    # empty range -> the groupBy emits no row; union with the zero row and
    # keep the max so the caller always gets exactly one row
    return est.unionByName(zero).agg(
        F.max("est_distinct").cast("bigint").alias("est_distinct")
    )
