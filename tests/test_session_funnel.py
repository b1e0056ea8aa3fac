"""Event-time session-window funnel: strict-order depth, late-data
semantics under a watermark, exactly-once append emission.

The batch semantics are oracle-gated by the `session_funnel_depth` registry
entry (gaps-and-islands SQL twin); this file covers what the oracle cannot:
the STREAMING contract — a late event inside the watermark horizon merges
into its session before emission, a late event beyond the horizon is
dropped (and counted in progress metrics), and a closed session is emitted
exactly once.
"""

from __future__ import annotations

import json
import os
import time as _time

from oltp_to_data_warehouse_pipeline_spark.streaming import windows

SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _ev(uid, ts, typ):
    return {"user_id": uid, "ts": ts, "event_type": typ, "value": 1.0}


def test_session_funnel_batch_strict_order(spark):
    rows = [
        # walked in order -> depth 3
        _ev(1, "2024-01-01 10:00:00", "view"),
        _ev(1, "2024-01-01 10:05:00", "click"),
        _ev(1, "2024-01-01 10:06:00", "purchase"),
        # purchase BEFORE the first view -> depth 1 (strict order)
        _ev(2, "2024-01-01 10:00:00", "purchase"),
        _ev(2, "2024-01-01 10:01:00", "view"),
        # no view at all -> depth 0 even though click+purchase exist
        _ev(3, "2024-01-01 10:00:00", "click"),
        _ev(3, "2024-01-01 10:01:00", "purchase"),
        # two sessions for one user: gap >= 30m splits them
        _ev(4, "2024-01-01 10:00:00", "view"),
        _ev(4, "2024-01-01 11:00:00", "view"),
    ]
    import datetime as _dt

    df = spark.createDataFrame(
        [
            (
                r["user_id"],
                _dt.datetime.fromisoformat(r["ts"]),
                r["event_type"],
                r["value"],
            )
            for r in rows
        ],
        SCHEMA,
    )
    out = windows.session_funnel(df, watermark=None)
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"], r["funnel_depth"])
        for r in out.collect()
    }
    assert (1, "2024-01-01 10:00:00", 3, 3) in got
    assert (2, "2024-01-01 10:00:00", 2, 1) in got
    assert (3, "2024-01-01 10:00:00", 2, 0) in got
    assert (4, "2024-01-01 10:00:00", 1, 1) in got
    assert (4, "2024-01-01 11:00:00", 1, 1) in got
    assert len(got) == 5


def test_session_funnel_stream_late_data(spark, tmp_path):
    """One micro-batch per file (staggered mtimes): the watermark advances
    between arrivals, so the three late-data behaviors are each pinned —
    in-horizon late events merge, beyond-horizon late events drop (without
    duplicating the already-emitted session), and sessions emit once."""
    src = tmp_path / "src"
    src.mkdir()

    def write(name, rows, mtime):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (mtime, mtime))

    t0 = _time.time()
    # b1: user 1 walks view->click; user 6 violates strict order
    write("b1.json", [
        _ev(1, "2024-01-01 10:00:00", "view"),
        _ev(1, "2024-01-01 10:05:00", "click"),
        _ev(6, "2024-01-01 10:00:00", "click"),
        _ev(6, "2024-01-01 10:01:00", "view"),
        _ev(6, "2024-01-01 10:02:00", "purchase"),
    ], t0)
    # b2: user 9's click at 12:00 pushes the watermark to 11:50 at batch
    # end -> the 10:xx sessions finalize
    write("b2.json", [_ev(9, "2024-01-01 12:00:00", "click")], t0 + 10)
    # b3: a LATE view for user 9 (11:55 < max seen 12:00) but INSIDE the
    # horizon (>= watermark 11:50): must merge, extending the session to
    # [11:55, 12:30) and making the funnel strictly ordered (view 11:55
    # precedes click 12:00 -> depth 2)
    write("b3.json", [_ev(9, "2024-01-01 11:55:00", "view")], t0 + 20)
    # b4: a late purchase for user 1 BEYOND the horizon (10:10 << 11:50):
    # dropped — user 1's emitted session must not duplicate or grow.  The
    # 14:00 event advances the watermark past user 9's session end.
    write("b4.json", [
        _ev(1, "2024-01-01 10:10:00", "purchase"),
        _ev(8, "2024-01-01 14:00:00", "view"),
    ], t0 + 30)
    # b5: one more batch so user 9's now-closable session emits
    write("b5.json", [_ev(8, "2024-01-01 14:01:00", "click")], t0 + 40)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        windows.session_funnel(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM funnel_sink").collect()
    got = sorted(
        (r["user_id"], str(r["session_start"]), r["n_events"], r["funnel_depth"])
        for r in rows
    )
    # user 1: exactly ONE emission, n=2 (the beyond-horizon purchase did
    # not land), depth 2; user 6: strict-order violation caps depth at 1;
    # user 9: the in-horizon late view merged (session start moved to
    # 11:55, n=2, depth 2).  user 8's session is still open -> not emitted.
    assert got == [
        (1, "2024-01-01 10:00:00", 2, 2),
        (6, "2024-01-01 10:00:00", 3, 1),
        (9, "2024-01-01 11:55:00", 2, 2),
    ]
    metrics = windows.progress_metrics(q)
    assert metrics["dropped_by_watermark"] >= 1, metrics
