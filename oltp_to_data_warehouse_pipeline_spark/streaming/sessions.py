"""Timer-driven session assembly via transformWithStateInPandas.

The arbitrary-state successor to `applyInPandasWithState` (Spark 4.x):
typed per-key state plus EVENT-TIME TIMERS, which is what windowed
aggregation cannot express — a session closes when the watermark proves no
more in-gap events can arrive, and the CLOSED session row is emitted from
the timer callback, exactly once, with no polling.

Contrast with `streaming/windows.session_counts` (session_window): the
built-in gives per-window aggregates with output driven by the same
watermark, but state shape and emission policy are fixed.  This operator
owns both: arbitrary session payload (first/last ts, count, value sum —
extendable to e.g. distinct pages or a session replay pointer) and emit-on-
close semantics.

Scale: state is one ValueState row + one timer per ACTIVE key, partitioned
by the grouping key across the state store (RocksDB on clusters); closed
keys are cleared immediately, so state size tracks concurrent sessions,
not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

try:  # the TWS protocol needs google.protobuf; gate so the module (and the
    # processor's pure-pandas logic) stays importable without it
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - exercised in protobuf-less envs
    StatefulProcessor = object  # type: ignore[assignment,misc]
    ExpiredTimerInfo = StatefulProcessorHandle = TimerValues = object  # type: ignore
    TWS_AVAILABLE = False

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, total double"


class _SessionProcessor(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState("sess", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        start, last, n, total = (
            self.state.get() if self.state.exists() else (None, None, 0, 0.0)
        )
        old_deadline = None if last is None else last + self.gap_ms
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start = lo if start is None else min(start, lo)
            last = hi if last is None else max(last, hi)
            n += len(pdf)
            total += float(pdf["value"].sum())
        if last is not None:
            self.state.update((start, last, n, total))
            # one timer per key: move the close deadline outward as events
            # extend the session (delete-then-register keeps a single timer)
            if old_deadline is not None:
                self.handle.deleteTimer(old_deadline)
            self.handle.registerTimer(last + self.gap_ms)
        return iter(())

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self.state.exists():
            return iter(())
        start, last, n, total = self.state.get()
        self.state.clear()
        out = pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(last, unit="ms")],
                "n_events": [n],
                "sum_value": [round(total, 4)],
            }
        )
        return iter((out,))

    def close(self) -> None:
        pass


def sessionize(
    sdf: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Closed sessions per user_id: emitted when event time advances past
    last_event + gap.  Expects columns (user_id, ts, value)."""
    if not TWS_AVAILABLE:
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf on the Python "
            "path; install protobuf or use streaming.windows.session_counts"
        )
    amount = {"minutes": 60_000, "seconds": 1_000, "hours": 3_600_000}
    num, unit = gap.split()
    gap_ms = int(num) * amount[unit.rstrip("s") + "s"]
    return (
        sdf.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _SessionProcessor(gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
