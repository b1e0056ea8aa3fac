"""File-format sources and sinks: parquet / CSV / JSON / ORC.

The reference reads parquet (`quality_checks.py:88`) and JDBC only; a
standalone engine needs the standard file formats too.  All readers take an
EXPLICIT schema — at 100 TB, schema inference is a full extra pass over the
data (CSV/JSON infer by scanning), and silent drift is how pipelines rot.

Sinks write date-partitioned layouts (SURVEY §4: partition pruning is the
engine's substitute for the reference's btree indexes) with a bounded file
count per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_READ_OPTS: dict[str, dict[str, str]] = {
    # permissive + corrupt-record capture mirrors the CDC poison-message
    # policy (ST5): bad rows land in _corrupt_record instead of failing the job
    "csv": {"header": "true", "mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    "json": {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    "parquet": {},
    "orc": {},
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Schema-explicit scan.  ``schema`` is required for text formats
    (CSV/JSON) — inference there costs a full extra pass and is
    non-deterministic under drift; columnar formats carry their own."""
    if fmt not in _READ_OPTS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READ_OPTS)}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} scans require an explicit schema (no inference pass)")
    reader = spark.read.options(**_READ_OPTS[fmt])
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_files_per_partition: int = 1,
) -> None:
    """Partitioned write with bounded files per partition.

    ``repartition(partition cols)`` routes each output partition's rows to
    ``max_files_per_partition`` tasks, so a 1000-task stage does not emit
    1000 small files into every date directory (the small-file problem that
    kills scan throughput at scale)."""
    if fmt not in _READ_OPTS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READ_OPTS)}")
    out = df
    writer_opts = {"header": "true"} if fmt == "csv" else {}
    if partition_by:
        parts = [F.col(c) for c in partition_by]
        if max_files_per_partition > 1:
            parts.append((F.spark_partition_id() % max_files_per_partition).alias("__salt"))
        out = df.repartition(*parts)
    writer = out.write.format(fmt).mode(mode).options(**writer_opts)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered, sorted write — the data-skipping layout.

    ``repartitionByRange(sort_cols)`` gives each output file a DISJOINT key
    range and ``sortWithinPartitions`` orders rows inside it, so parquet
    row-group min/max statistics become selective: a point or range filter
    on the sort key prunes whole files and row groups at scan time.  This is
    the plain-parquet equivalent of clustering/Z-order on one dimension —
    the substitute for the reference's btree indexes (`mongo_postgres_cdc.py
    :277-280`) that actually works at 100 TB.  Unsorted writes interleave
    keys across every file, making every min/max span the whole domain and
    every filter a full scan.
    """
    if fmt not in _READ_OPTS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READ_OPTS)}")
    cols = [F.col(c) for c in sort_cols]
    out = df.repartitionByRange(num_files, *cols).sortWithinPartitions(*cols)
    out.write.format(fmt).mode(mode).save(path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> tuple[int, int]:
    """Small-file compaction: rewrite a table directory into ~target-size
    files.  Returns (files_before, files_after).

    Streaming upserts and per-trigger micro-batches accrete thousands of
    tiny files; at scale the scan cost becomes file-open latency, not bytes.
    Sizing from the actual on-disk bytes (``len`` over the scan's file
    index) avoids a data pass; the rewrite is one coalesce-shaped shuffle to
    ``ceil(bytes / target)`` tasks.  The rewrite goes through a temp
    directory + overwrite so a mid-job failure never leaves the table
    half-deleted (the final overwrite is the only destructive step, and it
    is itself a Spark job with task-commit atomicity).
    """
    df = read_table(spark, path, fmt)
    # file inventory from the hidden `_metadata` struct: names AND sizes come
    # from the scan's own file index (no data columns projected, no
    # driver-side filesystem walk) — works identically on local/HDFS/S3
    inv = (
        df.select(
            F.col("_metadata.file_path").alias("f"),
            F.col("_metadata.file_size").alias("bytes"),
        )
        .distinct()  # (path, size) is one row per file — size is a constant per path
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bytes").alias("total"))
        .first()
    )
    n_before = int(inv["n"])
    total = int(inv["total"] or 0)
    n_after = max(1, -(-total // target_file_bytes))
    if n_after >= n_before:
        return (n_before, n_before)  # already compact — don't rewrite
    tmp = path.rstrip("/") + "__compact_tmp"
    df.repartition(int(n_after)).write.format(fmt).mode("overwrite").save(tmp)
    spark.read.format(fmt).load(tmp).write.format(fmt).mode("overwrite").save(path)
    # best-effort temp cleanup (local/HDFS path via Hadoop FS API)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    fs_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs_path.getFileSystem(jsc.hadoopConfiguration()).delete(fs_path, True)
    return (n_before, int(n_after))


def zorder_key(cols: list, mins: list[float], maxs: list[float], bits: int = 16):
    """Morton (Z-order) key expression: interleave the ``bits``-bit
    quantized ranks of each column.

    Each column is linearly scaled into [0, 2^bits) using the provided
    min/max, then bit b of column i lands at position ``b*ncols + i`` of the
    key.  All terms occupy disjoint bit positions, so a plain SUM equals the
    bitwise OR and the whole key is one codegen'd integer expression —
    ncols*bits shift/mask terms, no UDF.

    NULL cluster-column values quantize to bucket 0 EXPLICITLY: they sort
    together at the low end of that dimension instead of riding the
    NULL-skipping behavior of least/greatest into the TOP bucket, where
    they would co-locate with max-value rows and inflate every file's
    min/max span on the other dimensions (round-2 advisor finding).
    """
    n = len(cols)
    if not (1 <= n * bits <= 62):
        raise ValueError(f"ncols*bits must fit a signed 64-bit key, got {n}x{bits}")
    quantized = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            quantized.append(F.lit(0).cast("long"))
            continue
        q = F.floor((col.cast("double") - float(lo)) / span * ((1 << bits) - 1))
        clamped = F.greatest(F.lit(0), F.least(q, F.lit((1 << bits) - 1)))
        quantized.append(
            F.when(col.isNull(), F.lit(0)).otherwise(clamped).cast("long")
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            key = key + F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    fmt: str = "parquet",
    mode: str = "overwrite",
    bits: int = 16,
) -> None:
    """Multi-dimensional clustered (Z-ordered) write — data skipping on
    SEVERAL filter columns at once.

    ``write_sorted`` makes one dimension's min/max stats selective but
    leaves every other column spanning the full domain in every file.
    Sorting by the Morton interleave of the cluster columns keeps rows that
    are close in EVERY dimension in the same file, so each file covers only
    a fraction of each column's range and a predicate on ANY subset of the
    cluster columns prunes files/row groups (the open-table-format
    ``ZORDER BY`` affordance, on plain parquet).

    Cost: one tiny agg pass for per-column min/max (driver gets 2·ncols
    scalars — at 100 TB this reads parquet footer stats, not data), then the
    same repartitionByRange + local sort as ``write_sorted``; the key never
    hits disk.  Quantization uses fixed global bounds, so the layout is
    deterministic under repartition/retry.
    """
    if fmt not in _READ_OPTS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_READ_OPTS)}")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cluster_cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cluster_cols)],
    ).first()
    # empty input / all-NULL cluster column → no bounds; treat that column
    # as constant (zorder_key's span<=0 path) so the write degrades to a
    # plain single-range write instead of crashing on float(None)
    mins = [stats[f"lo_{i}"] if stats[f"lo_{i}"] is not None else 0.0 for i in range(len(cluster_cols))]
    maxs = [stats[f"hi_{i}"] if stats[f"hi_{i}"] is not None else 0.0 for i in range(len(cluster_cols))]
    key = zorder_key(cluster_cols, mins, maxs, bits=bits)
    out = (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    out.write.format(fmt).mode(mode).save(path)
