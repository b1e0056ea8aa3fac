"""transformWithStateInPandas sessionizer.

The TWS runtime needs `google.protobuf` (pyspark/sql/streaming/proto's
generated pb2 modules speak the state-server protocol through it), which
this container lacks — the full-stream test auto-skips there and runs
wherever protobuf exists.  Vendoring was evaluated and is infeasible here:
no protobuf runtime exists anywhere on this image (only typeshed stubs)
and the container has no network, so un-skipping would mean reimplementing
the protobuf wire format + descriptor machinery, which is not a
reasonable trade for one environment-bound test.  The processor's LOGIC
(state math, timer re-registration, emit-on-close) is pure pandas, so it
is unit-tested directly against a fake handle below, protobuf or not, and
the session semantics are equivalence-gated against Spark's built-in
``F.session_window`` on real fixture data.
"""

from __future__ import annotations

import importlib.util
import json

import pandas as pd
import pytest

from oltp_to_data_warehouse_pipeline_spark.streaming.sessions import (
    _SessionProcessor,
    sessionize,
)

try:
    HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    HAS_PROTOBUF = False

SCHEMA = "user_id long, ts timestamp, value double"


class _FakeListState:
    """The ListState contract the TWS runtime provides: tuples round-trip
    through the store (serialize→persist→deserialize), surviving processor
    restarts."""

    def __init__(self):
        self.value = None

    def exists(self):
        return self.value is not None

    def get(self):
        return iter(self.value)

    def put(self, rows):
        self.value = [tuple(r) for r in rows]

    def appendValue(self, row):
        self.value = (self.value or []) + [tuple(row)]

    def clear(self):
        self.value = None


class _FakeTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


class _FakeHandle:
    def __init__(self):
        self.state = _FakeListState()
        self.timers = set()

    def getListState(self, name, schema):
        return self.state

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)


def _pdf(rows):
    return pd.DataFrame(
        {"ts": pd.to_datetime([r[0] for r in rows]), "value": [r[1] for r in rows]}
    )


def test_processor_accumulates_and_moves_timer():
    proc = _SessionProcessor(gap_ms=600_000)  # 10 minutes
    h = _FakeHandle()
    proc.init(h)

    list(proc.handleInputRows((1,), iter([_pdf([("2024-01-01 10:00:00", 1.0)])]), None))
    t0 = pd.Timestamp("2024-01-01 10:00:00").value // 1_000_000
    assert h.state.value == [(t0, t0, 1, 1.0)]
    assert h.timers == {t0 + 600_000}

    # a later in-gap event extends the run and MOVES its single timer
    list(proc.handleInputRows((1,), iter([_pdf([("2024-01-01 10:05:00", 2.0)])]), None))
    t1 = t0 + 300_000
    assert h.state.value == [(t0, t1, 2, 3.0)]
    assert h.timers == {t1 + 600_000}, "old timer must be deleted, one timer per run"


def test_processor_emits_on_timer_and_clears():
    proc = _SessionProcessor(gap_ms=600_000)
    h = _FakeHandle()
    proc.init(h)
    list(
        proc.handleInputRows(
            (7,),
            iter([_pdf([("2024-01-01 10:00:00", 1.5), ("2024-01-01 10:04:00", 0.5)])]),
            None,
        )
    )
    out = list(proc.handleExpiredTimer((7,), None, None))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["user_id"] == 7 and row["n_events"] == 2 and row["sum_value"] == 2.0
    assert str(row["session_start"]) == "2024-01-01 10:00:00"
    assert str(row["session_end"]) == "2024-01-01 10:04:00"
    assert not h.state.exists(), "closed session must clear state"
    # a second firing with no state emits nothing
    assert list(proc.handleExpiredTimer((7,), None, None)) == []


def test_processor_sessions_equal_builtin_session_window(spark):
    """Equivalence gate: the custom TWS sessionizer must produce exactly the
    sessions that Spark's built-in ``F.session_window`` batch aggregation
    assigns for the same gap.  Runs the processor logic against the fake
    handle (protobuf-free) over the sf0.001 events table, firing every
    remaining timer at end-of-stream — semantically the watermark passing
    the last gap."""
    import pyspark.sql.functions as F

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        # truncate to millisecond precision: the processor keeps state in
        # epoch-millis (timer granularity), so feed both sides ms-truncated
        # events to compare session semantics, not sub-ms formatting
        .select(
            "user_id",
            F.timestamp_millis(F.unix_millis(F.col("ts").cast("timestamp"))).alias("ts"),
            "value",
        )
        .where(F.col("user_id") < 20)
    )
    gap = "10 minutes"
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n"], round(r["s"], 6))
        for r in ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
        )
        .collect()
    }

    pdf = ev.toPandas().sort_values(["user_id", "ts"])
    got = set()
    for uid, grp in pdf.groupby("user_id"):
        proc = _SessionProcessor(gap_ms=600_000)
        h = _FakeHandle()
        proc.init(h)
        # deliver in event-time order, one micro-batch per event (worst case)
        for _, row in grp.iterrows():
            # close any session whose timer precedes this event (watermark
            # has provably passed its gap)
            ev_ms = row["ts"].value // 1_000_000
            for t in sorted(h.timers):
                if t <= ev_ms:
                    h.timers.discard(t)
                    for out in proc.handleExpiredTimer((uid,), None, _FakeTimerInfo(t)):
                        for _, r in out.iterrows():
                            got.add((uid, str(r["session_start"]), str(r["session_end"]),
                                     r["n_events"], round(r["sum_value"], 6)))
            list(proc.handleInputRows(
                (uid,),
                iter([pd.DataFrame({"ts": [row["ts"]], "value": [row["value"]]})]),
                None,
            ))
        if h.timers:  # end of stream: watermark -> +inf closes every run
            for out in proc.handleExpiredTimer((uid,), None, None):
                for _, r in out.iterrows():
                    got.add((uid, str(r["session_start"]), str(r["session_end"]),
                             r["n_events"], round(r["sum_value"], 6)))
    assert got == expected


@pytest.mark.skipif(not HAS_PROTOBUF, reason="TWS runtime needs google.protobuf")
def test_sessions_close_on_gap_real_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batch1 = [
        {"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 1.0},
        {"user_id": 1, "ts": "2024-01-01 10:05:00", "value": 2.0},
        {"user_id": 2, "ts": "2024-01-01 10:01:00", "value": 5.0},
        {"user_id": 9, "ts": "2024-01-01 12:00:00", "value": 0.0},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in batch1))
    sdf = spark.readStream.schema(SCHEMA).json(str(src))
    out = sessionize(sdf, gap="10 minutes", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("tws_s1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {(r["user_id"], r["n_events"], r["sum_value"]) for r in spark.table("tws_s1").collect()}
    assert (1, 2, 3.0) in rows and (2, 1, 5.0) in rows
    assert not any(r[0] == 9 for r in rows)


def test_processor_state_recovery_across_restarts(spark):
    """State-recovery gate (VERDICT r7 item 5): the TWS runtime persists
    ValueState + timers in the state store and re-inits the processor on
    every executor restart — here that contract is driven directly: events
    arrive as RECORDED micro-batches (seeded random batch sizes), and
    between every two batches the processor object is DISCARDED and a
    fresh instance re-init'ed over the surviving handle state, exactly the
    recovery path the protobuf-gated full-stream test would exercise.
    Final sessions must equal Spark's built-in session_window over the
    same events."""
    import random

    import pyspark.sql.functions as F

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            "user_id",
            F.timestamp_millis(F.unix_millis(F.col("ts").cast("timestamp"))).alias("ts"),
            "value",
        )
        .where(F.col("user_id") < 12)
    )
    gap = "10 minutes"
    expected = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n"],
         round(r["s"], 6))
        for r in ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
        )
        .collect()
    }

    rng = random.Random(81)
    pdf = ev.toPandas().sort_values(["user_id", "ts"])
    got = set()
    for uid, grp in pdf.groupby("user_id"):
        h = _FakeHandle()  # the durable store: survives processor restarts
        proc = _SessionProcessor(gap_ms=600_000)
        proc.init(h)
        rows = list(grp.itertuples())
        i = 0
        while i < len(rows):
            batch = rows[i : i + rng.randint(1, 4)]
            i += len(batch)
            # timers that the watermark (min event time of this batch, as
            # both sides are in event-time order) has passed fire FIRST
            wm = min(r.ts.value // 1_000_000 for r in batch)
            for t in sorted(h.timers):
                if t <= wm:
                    h.timers.discard(t)
                    for out in proc.handleExpiredTimer((uid,), None, _FakeTimerInfo(t)):
                        for _, r in out.iterrows():
                            got.add((uid, str(r["session_start"]), str(r["session_end"]),
                                     r["n_events"], round(r["sum_value"], 6)))
            list(proc.handleInputRows(
                (uid,),
                iter([pd.DataFrame({"ts": [r.ts for r in batch],
                                    "value": [r.value for r in batch]})]),
                None,
            ))
            # RESTART: throw the processor away; only handle state survives
            # (the runtime's serialize→store→deserialize is the tuple
            # round-trip _FakeState already performs on update/get)
            proc = _SessionProcessor(gap_ms=600_000)
            proc.init(h)
        if h.timers:  # end of stream: watermark -> +inf closes every run
            for out in proc.handleExpiredTimer((uid,), None, None):
                for _, r in out.iterrows():
                    got.add((uid, str(r["session_start"]), str(r["session_end"]),
                             r["n_events"], round(r["sum_value"], 6)))
    assert got == expected


def test_batch_spanning_gap_keeps_two_runs_until_watermark():
    """A single micro-batch whose events span more than the gap must hold
    TWO open runs (session_window splits them), each with its own timer,
    and a timer firing must close ONLY the runs the watermark has passed —
    the round-8 finding single-tuple state got wrong (it merged them)."""
    proc = _SessionProcessor(gap_ms=600_000)
    h = _FakeHandle()
    proc.init(h)
    t0 = pd.Timestamp("2024-01-01 10:00:00").value // 1_000_000
    list(proc.handleInputRows(
        (3,),
        iter([_pdf([
            ("2024-01-01 10:00:00", 1.0),
            ("2024-01-01 10:05:00", 2.0),
            ("2024-01-01 11:00:00", 4.0),  # > gap after 10:05 — second run
        ])]),
        None,
    ))
    t_run2 = t0 + 3_600_000
    assert h.state.value == [(t0, t0 + 300_000, 2, 3.0), (t_run2, t_run2, 1, 4.0)]
    assert h.timers == {t0 + 300_000 + 600_000, t_run2 + 600_000}
    # watermark passes run 1 only: exactly one session emits, run 2 stays
    out = list(proc.handleExpiredTimer((3,), None, _FakeTimerInfo(t0 + 900_000)))
    assert len(out) == 1 and len(out[0]) == 1
    r = out[0].iloc[0]
    assert r["n_events"] == 2 and r["sum_value"] == 3.0
    assert h.state.value == [(t_run2, t_run2, 1, 4.0)]
    # a late in-gap event may still EXTEND the surviving run
    list(proc.handleInputRows(
        (3,), iter([_pdf([("2024-01-01 11:08:00", 1.0)])]), None
    ))
    assert h.state.value == [(t_run2, t_run2 + 480_000, 2, 5.0)]
    assert h.timers == {
        t0 + 900_000,  # fired timers are removed by the RUNTIME, not the proc
        t_run2 + 480_000 + 600_000,
    }
