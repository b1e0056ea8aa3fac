"""Streaming trending top-k: watermark close semantics, exactly-once
emission per window, in-horizon late data counted, beyond-horizon dropped,
and replay-idempotent sink layout.

The batch semantics are oracle-gated by the `trending_event_types`
registry entry; this file covers the STREAMING contract the oracle
cannot."""

from __future__ import annotations

import json
import os
import time as _time

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.streaming.trending import (
    rank_topk,
    trending_topk_query,
    windowed_key_counts,
)

SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _ev(ts, typ):
    return {"user_id": 1, "ts": ts, "event_type": typ, "value": 1.0}


def test_batch_rank_deterministic_tiebreak(spark):
    import datetime as _dt

    rows = [
        _ev("2024-01-01 10:05:00", "click"),
        _ev("2024-01-01 10:06:00", "click"),
        _ev("2024-01-01 10:07:00", "view"),
        _ev("2024-01-01 10:08:00", "error"),
    ]
    df = spark.createDataFrame(
        [(r["user_id"], _dt.datetime.fromisoformat(r["ts"]), r["event_type"], r["value"]) for r in rows],
        SCHEMA,
    )
    out = rank_topk(windowed_key_counts(df, watermark=None), k=2).collect()
    by_win = {}
    for r in out:
        by_win.setdefault(str(r["window_start"]), []).append((r["rank"], r["key"], r["n"]))
    # every event lands in exactly 2 sliding windows; per window: click(2)
    # ranks 1, then the n=1 tie breaks alphabetically -> error ranks 2
    for win, ranked in by_win.items():
        assert sorted(ranked) == [(1, "click", 2), (2, "error", 1)], win


def test_stream_trending_watermark_and_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows, mtime):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (mtime, mtime))

    t0 = _time.time()
    # b1: the 10:00 windows' payload — view 3x, click 2x
    write("b1.json", [
        _ev("2024-01-01 10:05:00", "click"),
        _ev("2024-01-01 10:06:00", "click"),
        _ev("2024-01-01 10:07:00", "view"),
        _ev("2024-01-01 10:20:00", "view"),
        _ev("2024-01-01 10:21:00", "view"),
    ], t0)
    # b2: 12:05 advances the watermark to 11:55 at batch end -> windows
    # [09:30,10:30) and [10:00,11:00) close and emit
    write("b2.json", [_ev("2024-01-01 12:05:00", "error")], t0 + 10)
    # b3: late view at 11:58 (< max ts 12:05 but >= watermark 11:55):
    # must count into the still-open [11:00,12:00) and [11:30,12:30)
    write("b3.json", [_ev("2024-01-01 11:58:00", "view")], t0 + 20)
    # b4: beyond-horizon late click at 10:10 (<< 11:55): dropped — the
    # emitted 10:00 windows must not duplicate or change.  14:00 advances
    # the watermark to 13:50, closing the 11:xx/12:00 windows.
    write("b4.json", [
        _ev("2024-01-01 10:10:00", "click"),
        _ev("2024-01-01 14:00:00", "view"),
    ], t0 + 30)
    # b5: 15:30 closes the 14:00 windows
    write("b5.json", [_ev("2024-01-01 15:30:00", "purchase")], t0 + 40)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    sink = str(tmp_path / "sink")
    q = trending_topk_query(
        stream,
        sink_path=sink,
        checkpoint=str(tmp_path / "ckpt"),
        window_len="1 hour",
        slide="30 minutes",
        watermark="10 minutes",
        k=3,
        available_now=True,
    )
    assert q.awaitTermination(180), "query must terminate after draining the backlog"
    q.stop()

    got = sorted(
        (str(r["window_start"]), r["key"], r["n"], r["rank"])
        for r in spark.read.parquet(sink)
        .select("window_start", "key", "n", "rank")
        .collect()
    )
    assert got == sorted([
        # the 10:00 payload, in both its sliding windows — WITHOUT the
        # beyond-horizon click (n stays 2) and emitted exactly once
        ("2024-01-01 09:30:00", "view", 3, 1),
        ("2024-01-01 09:30:00", "click", 2, 2),
        ("2024-01-01 10:00:00", "view", 3, 1),
        ("2024-01-01 10:00:00", "click", 2, 2),
        # the in-horizon late 11:58 view landed in both its windows
        ("2024-01-01 11:00:00", "view", 1, 1),
        ("2024-01-01 11:30:00", "error", 1, 1),  # n=1 tie: error < view
        ("2024-01-01 11:30:00", "view", 1, 2),
        ("2024-01-01 12:00:00", "error", 1, 1),
        # 14:00 view's windows closed by b5's 15:30 purchase
        ("2024-01-01 13:30:00", "view", 1, 1),
        ("2024-01-01 14:00:00", "view", 1, 1),
    ]), got
    # exactly-once per (window, key)
    assert len(got) == len({(w, k) for (w, k, _, _) in got})
