"""Z-order (Morton) data layout — multi-column data skipping.

A single-column sort gives parquet min/max file stats that prune scans on
that column only; interleaving the bits of TWO OR MORE columns gives every
file a small bounding box in all of them at once, so selective predicates
on any participating column skip most files.  This is the layout trick
behind Delta/Iceberg `ZORDER BY`, reimplemented here as plain DataFrame
expressions:

- :func:`scaled` maps a column into ``[0, 2^bits)`` with exact integer
  arithmetic (no double division anywhere — a floor of a double quotient
  can flip on x.9999995 boundaries between engines).
- :func:`zvalue` interleaves the scaled columns' bits into one bigint
  (column j's bit i lands at position ``i*n + (n-1-j)``), a pure narrow
  expression — zero shuffle to compute.
- :func:`write_zordered` range-partitions on the z-value and sorts within
  partitions before writing, which is exactly one shuffle for any number
  of layout columns.

100 TB posture: the z-value is scan-side arithmetic; the one range
exchange replaces the one a plain sorted write needs anyway, and the
min/max scaling bounds come from table statistics (here: a 1-row
aggregate broadcast — the same scalar-without-collect pattern as
balance_opportunity_segments).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scaled(c: Column, cmin: Column, cmax: Column, bits: int = 16) -> Column:
    """Map integer ``c`` with range [cmin, cmax] into [0, 2^bits) exactly.

    ``(c - cmin) * (2^bits - 1) DIV (cmax - cmin)`` in integer space: the
    numerator stays ≤ range · 65535 (< 2^53 for any 32-bit key range), and
    the floor division is spelled ``(a - a mod b) / b`` — the numerator is
    then exactly divisible, so the double division is exact and engine-
    independent (a DuckDB twin can use ``//`` directly).  Degenerate
    single-value ranges map to 0.
    """
    a = (c.cast("bigint") - cmin.cast("bigint")) * F.lit((1 << bits) - 1)
    b = cmax.cast("bigint") - cmin.cast("bigint")
    return F.when(b == 0, F.lit(0)).otherwise(
        ((a - F.pmod(a, b)) / b).cast("bigint")
    )


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z value: bit-interleave ``len(cols)`` already-scaled columns
    (each in [0, 2^bits)) into one bigint.  With n columns and 16 bits the
    result uses n·16 bits — keep n·bits ≤ 62."""
    n = len(cols)
    assert n >= 2 and n * bits <= 62, "need ≥2 columns and n*bits ≤ 62"
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * n + (n - 1 - j))
    return out.cast("bigint")


def with_zvalue(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "zval"
) -> DataFrame:
    """Attach the z-value of ``cols`` (integer columns) as ``out_col``.

    Bounds come from ONE 1-row aggregate broadcast-cross-joined back (no
    collect; at 100 TB substitute catalog statistics as literals).
    """
    bounds = df.agg(
        *[f(c).alias(f"__{n}_{c}") for c in cols for n, f in (("min", F.min), ("max", F.max))]
    )
    j = df.crossJoin(F.broadcast(bounds))
    parts = [
        scaled(F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits) for c in cols
    ]
    return j.withColumn(out_col, zvalue(parts, bits)).drop(
        *[f"__{n}_{c}" for c in cols for n in ("min", "max")]
    )


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the z-curve of ``cols``:
    range-partitioned on the z-value (num_files output files) and sorted
    within each file, so every file carries a tight min/max bounding box
    in ALL the layout columns — the property parquet row-group/file
    skipping needs.  One shuffle total."""
    (
        with_zvalue(df, cols, bits)
        .repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
