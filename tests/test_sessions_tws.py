"""transformWithStateInPandas sessionizer.

The TWS runtime needs `google.protobuf` (Spark's state-server protocol),
which this container lacks — the full-stream test auto-skips there and runs
wherever protobuf exists.  The processor's LOGIC (state math, timer
re-registration, emit-on-close) is pure pandas, so it is unit-tested
directly against a fake handle below, protobuf or not.
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
