"""Sweep-line concurrency: two-phase prefix sum == plain global window,
half-open tie semantics, and the curve's conservation invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
from oltp_to_data_warehouse_pipeline_spark.operators import intervals

SF = "/root/testdata/sf0.001"


def _sessions(spark):
    from oltp_to_data_warehouse_pipeline_spark.streaming import windows

    ev = load_table(spark, SF, "events")
    return windows.session_counts(
        ev, gap="30 minutes", group_cols=("user_id",), watermark=None
    )


def _plain_timeline(df):
    """The textbook single-global-window formulation (what the oracle
    replays) — correct, unscalable, the yardstick."""
    b = df.select(F.col("session_start").alias("ts"), F.lit(1).alias("delta")).unionByName(
        df.select(F.col("session_end").alias("ts"), F.lit(-1).alias("delta"))
    )
    net = b.groupBy("ts").agg(F.sum("delta").cast("bigint").alias("net"))
    w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    return net.select("ts", F.sum("net").over(w).cast("bigint").alias("concurrent"))


def test_two_phase_equals_global_window(spark):
    sess = _sessions(spark)
    for bucket in ("hour", "day"):
        got = sorted(
            tuple(r)
            for r in intervals.concurrency_timeline(
                sess, bucket=bucket
            ).collect()
        )
        want = sorted(tuple(r) for r in _plain_timeline(sess).collect())
        assert got == want, f"bucket={bucket}"


def test_half_open_touching_intervals_never_overlap(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    mk = lambda s, e: (t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=e))
    df = spark.createDataFrame(
        [mk(0, 10), mk(10, 20), mk(20, 30)],
        "session_start timestamp, session_end timestamp",
    )
    tl = {r["ts"]: r["concurrent"] for r in intervals.concurrency_timeline(df).collect()}
    # at each touch point the close and open cancel: concurrency stays 1
    assert all(v == 1 for k, v in tl.items() if k != t0 + dt.timedelta(minutes=30))
    assert tl[t0 + dt.timedelta(minutes=30)] == 0


def test_curve_conservation(spark):
    """The final cumulative value is 0 (every open closes) and the curve
    never goes negative."""
    sess = _sessions(spark)
    tl = intervals.concurrency_timeline(sess)
    last = tl.orderBy(F.col("ts").desc()).limit(1).collect()[0]["concurrent"]
    assert last == 0
    assert tl.where(F.col("concurrent") < 0).count() == 0


def test_peaks_are_the_top_of_the_timeline(spark):
    sess = _sessions(spark)
    peaks = intervals.concurrency_peaks(sess, top_n=5).collect()
    tl_max = (
        intervals.concurrency_timeline(sess).agg(F.max("concurrent")).collect()[0][0]
    )
    assert peaks[0]["concurrent"] == tl_max
    # descending, ties by earliest ts
    vals = [(r["concurrent"], r["ts"]) for r in peaks]
    assert vals == sorted(vals, key=lambda v: (-v[0], v[1]))
