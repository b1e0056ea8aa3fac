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
