"""Event-time window aggregates with watermarks (SURVEY §7 step 7).

Beyond the reference's surface (§2.8 lists these as absent) but a natural
extension over the driver's ``events`` stream table: tumbling / sliding /
session windows with late-data handling.  The same builders work on batch
DataFrames (no watermark) and streaming DataFrames (with watermark), so the
batch twin is the oracle for the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.util import ensure_ltz


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    # Watermarks require TIMESTAMP (not TIMESTAMP_NTZ) — shared cast helper
    df = ensure_ltz(df, ts_col)
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling window: count + sum(value) per (window, group)."""
    src = _with_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_len), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_len: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding window: overlapping windows, global counts."""
    src = _with_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_len, slide))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: tuple[str, ...] = ("user_id",),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session window: activity sessions separated by ≥ ``gap`` idle time."""
    src = _with_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *group_cols,
            "n_events",
        )
    )


def session_funnel(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    type_col: str = "event_type",
    user_col: str = "user_id",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Event-time session-window funnel: per (user, session) the STRICT-ORDER
    funnel depth — stage *i* counts only if its first occurrence inside the
    session is at or after stage *i-1*'s first occurrence.

    One aggregation pass: the per-stage minima ride the same session-window
    aggregate as the event count (min(when(type==s, ts)) per stage), and the
    depth is a pure expression over those minima — no joins, no window
    functions, no per-stage re-scan.  Like the other builders here it works
    on batch frames (no watermark; the registry twin ``session_funnel_depth``
    oracles it against a gaps-and-islands SQL formulation) and on streams,
    where append mode emits each session exactly once — when the watermark
    proves no in-gap event can still extend it.  Late events inside the
    watermark horizon merge into (or extend) their session before it is
    emitted; events beyond the horizon are dropped by the state operator and
    show up in ``progress_metrics``'s ``dropped_by_watermark`` counter.

    Scale: state is one session-window row per ACTIVE (user, session) — the
    store tracks concurrent sessions, not history; the shuffle is the one
    keyed exchange on ``user_col`` that session_window aggregation needs."""
    src = _with_watermark(df, ts_col, watermark)
    stage_mins = [
        F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"__t{i}")
        for i, s in enumerate(stages)
    ]
    agg = src.groupBy(F.session_window(ts_col, gap), F.col(user_col)).agg(
        F.count(F.lit(1)).alias("n_events"), *stage_mins
    )
    depth = F.lit(0)
    reached = F.lit(True)
    prev: F.Column | None = None
    for i in range(len(stages)):
        t = F.col(f"__t{i}")
        step_ok = t.isNotNull() if prev is None else t.isNotNull() & (t >= prev)
        reached = reached & step_ok
        depth = depth + F.when(reached, 1).otherwise(0)
        prev = t
    return agg.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        user_col,
        "n_events",
        depth.cast("int").alias("funnel_depth"),
    )


def progress_metrics(query) -> dict:
    """Operational counters from a streaming query's recent progress:
    rows seen, state size, and — the one that guards correctness — rows
    DROPPED by the watermark.

    Late data past the watermark horizon is silently excluded from window
    results; at 100 TB "silently" is how gaps ship to dashboards.  This
    helper folds `StreamingQueryProgress.stateOperators` into a plain dict
    a pipeline can alert on (the watermark-lateness twin of the batch QC
    gate).  Counters are summed over the query's retained progress history
    (spark.sql.streaming.numRecentProgressUpdates, default 100 batches).
    """
    totals = {
        "input_rows": 0,
        "state_rows": 0,
        "dropped_by_watermark": 0,
        "batches": 0,
    }
    for p in query.recentProgress:
        totals["batches"] += 1
        totals["input_rows"] += int(p.get("numInputRows") or 0)
        ops = p.get("stateOperators") or []
        for op in ops:
            totals["dropped_by_watermark"] += int(op.get("numRowsDroppedByWatermark") or 0)
        if ops:
            # state size is a gauge, not a counter: report the LATEST
            # batch's total summed across ALL stateful operators (a plain
            # `or`-guard here would pin a drained store at its last nonzero
            # value and a state-size alert would never clear)
            totals["state_rows"] = sum(int(op.get("numRowsTotal") or 0) for op in ops)
    return totals
