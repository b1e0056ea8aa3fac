"""Slowly-changing dimension maintenance (SCD Type 2).

The reference rebuilds its dimensions from scratch every run (`DB.sql:24,51`
DROP + INSERT…SELECT) and its CDC path keeps only the latest row per key
(`mongo_postgres_cdc.py:359-380` ON CONFLICT DO UPDATE — effectively SCD
Type 1).  A real warehouse also needs Type 2 — keep every historical
version with a validity interval — which this module provides as a pure
set-based batch operator.

Row shape: the dimension carries ``valid_from`` (date), ``valid_to`` (date,
NULL = open) and ``is_current`` (int 0/1).  ``scd2_apply`` merges a batch of
updates in three keyed passes:

- rows whose tracked attributes CHANGED: the current version is closed out
  (``valid_to`` = effective date, ``is_current`` = 0) and a new open version
  is appended;
- brand-new keys: inserted as open versions;
- unchanged keys and already-closed history: pass through untouched.

Every pass is an equi-join / anti-join on the natural key — one key-hash
shuffle each, no windows over history, no driver round-trips — so the merge
cost scales with |dim| + |updates|, never with the length of history per
key.  (At 100 TB the dimension should also be partitioned/bucketed by the
key so these joins co-locate; see sources/bucketed.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(snapshot: DataFrame, valid_from: str = "1900-01-01") -> DataFrame:
    """Initial SCD2 load: every snapshot row becomes an open version."""
    return snapshot.select(
        "*",
        F.lit(valid_from).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str | None = None,
    eff_col: str | None = None,
) -> DataFrame:
    """Merge ``updates`` into an SCD2 dimension produced by
    :func:`scd2_init` / previous ``scd2_apply`` calls.

    ``updates`` must carry the dimension's full attribute schema (the key
    plus every non-SCD column); ``tracked`` names the subset whose change
    triggers a new version (ANY differing tracked attribute, null-safe).
    Updates for unknown keys are inserts.  The version boundary comes from
    exactly one of ``effective_date`` (one date for the whole batch — the
    scheduled-ETL case) or ``eff_col`` (a per-row date/timestamp column on
    ``updates`` — the CDC case, where each change carries its own event
    time).  Deterministic given deterministic inputs — no timestamps are
    read from the clock.

    When chaining many applies in ONE Spark job (backfills), materialize
    between rounds (``.localCheckpoint(eager=True)`` or a table write):
    each apply layers joins over the previous result and a deeply nested
    plan stalls the driver at analysis time, same as any iterative
    operator.  The streaming sink doesn't need this — every micro-batch
    writes to parquet, which truncates lineage naturally.
    """
    if (effective_date is None) == (eff_col is None):
        raise ValueError("pass exactly one of effective_date or eff_col")
    eff_expr = (
        F.col(eff_col).cast("date") if eff_col else F.lit(effective_date).cast("date")
    )
    current = dim.where(F.col("is_current") == 1)
    history = dim.where(F.col("is_current") == 0)

    attrs = [c for c in current.columns if c not in ("valid_from", "valid_to", "is_current")]
    upd = updates.select(*attrs, eff_expr.alias("__eff"))
    # null-safe "any tracked attr differs"
    joined = current.alias("c").join(upd.alias("u"), key, "inner")
    differs = None
    for t in tracked:
        d = ~F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}"))
        differs = d if differs is None else (differs | d)
    changed = joined.where(differs).select(
        F.col(f"c.{key}").alias(key), F.col("u.__eff").alias("__eff")
    )

    closed = (
        current.join(changed, key, "inner")
        .withColumn("valid_to", F.col("__eff"))
        .withColumn("is_current", F.lit(0))
        .drop("__eff")
    )
    untouched = current.join(changed.select(key), key, "anti")

    fresh = (
        upd.join(changed.select(key), key, "semi")
        .unionByName(upd.join(current.select(key), key, "anti"))  # brand-new keys
        .select(
            *attrs,
            F.col("__eff").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(1).alias("is_current"),
        )
    )
    return history.unionByName(untouched).unionByName(closed).unionByName(fresh)
