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

Scale: state is one ListState row + one timer per OPEN RUN of each active
key (normally exactly one; more only while a key's sessions await the
watermark), partitioned by the grouping key across the state store
(RocksDB on clusters); closed runs are dropped the moment their timer
fires, so state size tracks concurrent open sessions, not history.
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
# One row per OPEN run (gap-connected event group).  Multi-run state is
# load-bearing for correctness, not a generalization: a single micro-batch
# can span more than one session for a key (catch-up / availableNow
# replay), and single-tuple state would merge them into one session where
# the built-in session_window splits them (round-8 equivalence-test
# finding).  Runs stay open until the WATERMARK passes run.last + gap —
# never closed eagerly on batch-internal gaps, because a late in-gap event
# in a later batch may still bridge two runs into one session.
_STATE_SCHEMA = "start long, last long, n long, total double"


class _SessionProcessor(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.runs = handle.getListState("runs", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        old = [tuple(r) for r in self.runs.get()] if self.runs.exists() else []
        items = [list(r) for r in old]
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            vals = pdf["value"].to_numpy()
            items.extend(
                [int(t), int(t), 1, float(v)] for t, v in zip(ts_ms, vals)
            )
        if len(items) == len(old):
            return iter(())
        # classic interval merge with gap tolerance: sorted by start, an
        # item joins the current run iff it starts within gap of the run's
        # last event — exactly session_window's transitive-chain semantics
        # (pre-existing runs are internally gap-connected already).
        merged: list[list] = []
        for it in sorted(items, key=lambda x: (x[0], x[1])):
            if merged and it[0] <= merged[-1][1] + self.gap_ms:
                cur = merged[-1]
                cur[1] = max(cur[1], it[1])
                cur[2] += it[2]
                cur[3] += it[3]
            else:
                merged.append(list(it))
        self.runs.put([tuple(m) for m in merged])
        # one timer per OPEN run; move/collapse deadlines as runs merge
        old_deadlines = {r[1] + self.gap_ms for r in old}
        new_deadlines = {m[1] + self.gap_ms for m in merged}
        for t in old_deadlines - new_deadlines:
            self.handle.deleteTimer(t)
        for t in new_deadlines - old_deadlines:
            self.handle.registerTimer(t)
        return iter(())

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self.runs.exists():
            return iter(())
        runs = sorted(tuple(r) for r in self.runs.get())
        fired = (
            expiredTimerInfo.getExpiryTimeInMs()
            if expiredTimerInfo is not None
            else -1
        )
        if fired is None or fired < 0:  # close-all: end-of-stream/test path
            closed, kept = runs, []
        else:
            closed = [r for r in runs if r[1] + self.gap_ms <= fired]
            kept = [r for r in runs if r[1] + self.gap_ms > fired]
        if kept:
            self.runs.put(kept)
        else:
            self.runs.clear()
        if not closed:
            return iter(())
        out = pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _ in closed],
                "n_events": [n for _, _, n, _ in closed],
                "sum_value": [round(t, 4) for _, _, _, t in closed],
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
