"""As-of join — an operator Spark lacks natively (SURVEY task brief:
"custom operators … (a) composition of existing DataFrame ops").

``asof_join(left, right, on, left_ts, right_ts)`` attaches, to every left
row, the most recent right row with the same key whose timestamp is ≤ the
left timestamp (backward as-of, the market-data/point-in-time-features
semantics).

Implementation: union the two sides with a side tag, single window sorted by
(key, ts, side) carrying the right side's payload forward with
``last_value(ignoreNulls)`` — i.e. ONE shuffle on the join key, no range
explosion, no per-key driver loops.  This is the merge-join formulation:
cost ≈ sort of |L|+|R| within each key partition, which survives 100 TB
given a reasonable key cardinality; skewed keys are AQE's problem like any
other shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right row with right_ts ≤ left_ts per key.

    ``right_cols``: payload columns to attach (default: all non-key,
    non-timestamp columns).  Attached columns get ``suffix`` on collision.
    The right timestamp itself is attached as ``{right_ts}{suffix}``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lcols = left.columns
    payload = right_cols + [right_ts]

    # The whole right payload travels as ONE nullable struct, so a right row
    # whose payload columns are NULL still "wins" (no look-through to older
    # rows — last_value sees the struct, not the individual columns).
    rstruct_type = F.struct(*[F.col(c) for c in payload])
    tagged_left = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
    ).withColumn("__r", F.lit(None).cast(right.select(rstruct_type.alias("s")).schema["s"].dataType))
    tagged_right = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        rstruct_type.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # right rows (__side=0) sort before left rows at equal timestamps, so a
    # right row AT the left timestamp is visible to it (ties inclusive).
    # Among right rows tied on the SAME timestamp the payload hash is the
    # final sort key: the winner (the last one) is then deterministic under
    # repartitioning/replay instead of physical-order luck.  Any engine
    # breaks such ties arbitrarily; this pins ONE arbitrary-but-stable pick.
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts"), F.col("__side"), F.xxhash64(F.to_json(F.col("__r"))))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__f", F.last(F.col("__r"), ignorenulls=True).over(w))
    out_cols = [F.col(c) for c in lcols]
    for c in payload:
        name = f"{c}{suffix}" if c in lcols else c
        out_cols.append(F.col("__f")[c].alias(name))
    return filled.where(F.col("__side") == 1).select(*out_cols)
