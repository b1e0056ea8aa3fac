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


class _FakeState:
    def __init__(self):
        self.value = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = tuple(v)

    def clear(self):
        self.value = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeState()
        self.timers = set()

    def getValueState(self, name, schema):
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
    assert h.state.value == (t0, t0, 1, 1.0)
    assert h.timers == {t0 + 600_000}

    # a later event extends the session and MOVES the single timer
    list(proc.handleInputRows((1,), iter([_pdf([("2024-01-01 10:05:00", 2.0)])]), None))
    t1 = t0 + 300_000
    assert h.state.value == (t0, t1, 2, 3.0)
    assert h.timers == {t1 + 600_000}, "old timer must be deleted, one timer per key"


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
                    for out in proc.handleExpiredTimer((uid,), None, None):
                        r = out.iloc[0]
                        got.add((uid, str(r["session_start"]), str(r["session_end"]),
                                 r["n_events"], round(r["sum_value"], 6)))
            list(proc.handleInputRows(
                (uid,),
                iter([pd.DataFrame({"ts": [row["ts"]], "value": [row["value"]]})]),
                None,
            ))
        for _ in sorted(h.timers):  # end of stream: watermark -> +inf
            for out in proc.handleExpiredTimer((uid,), None, None):
                r = out.iloc[0]
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
