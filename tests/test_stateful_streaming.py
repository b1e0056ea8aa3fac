"""applyInPandasWithState first-seen dedup: real streaming, real state store.

Drives the operator with a file-source stream in two availableNow runs over
the SAME checkpoint: the second run must remember the first run's keys from
the persisted state store (not just within-batch memory).
"""

from __future__ import annotations

import json

from oltp_to_data_warehouse_pipeline_spark.streaming.stateful import dedup_first_seen

SCHEMA = "k string, seq long, v string"


def _write_files(src_dir, name, rows):
    (src_dir / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run_once(spark, src_dir, ckpt, out_dir):
    sdf = spark.readStream.schema(SCHEMA).json(str(src_dir))
    out = dedup_first_seen(sdf, ["k"])
    q = (
        out.writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.schema(SCHEMA).parquet(str(out_dir))


def test_first_seen_dedup_across_restarts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    # run 1: duplicate k=a within the batch -> one deterministic row each
    _write_files(
        src,
        "b1.json",
        [
            {"k": "a", "seq": 2, "v": "a-late"},
            {"k": "a", "seq": 1, "v": "a-early"},
            {"k": "b", "seq": 1, "v": "b-1"},
        ],
    )
    out_dir = tmp_path / "out"
    got1 = _run_once(spark, src, ckpt, out_dir)
    rows1 = {(r["k"], r["seq"], r["v"]) for r in got1.collect()}
    # representative = lexicographically smallest row (seq 1 sorts first)
    assert rows1 == {("a", 1, "a-early"), ("b", 1, "b-1")}

    # run 2, same checkpoint: k=a must be remembered (state store), k=c new
    _write_files(
        src,
        "b2.json",
        [
            {"k": "a", "seq": 3, "v": "a-again"},
            {"k": "c", "seq": 1, "v": "c-1"},
        ],
    )
    got2 = _run_once(spark, src, ckpt, out_dir)
    rows2 = {(r["k"], r["seq"], r["v"]) for r in got2.collect()}
    # sink is cumulative: run 2 may add ONLY the new key c — a re-emitted
    # 'a' would prove the state store was not consulted
    assert rows2 == rows1 | {("c", 1, "c-1")}, "state store failed to suppress re-seen key"


def test_dedup_within_watermark_drops_in_horizon_repeats(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.streaming.stateful import (
        dedup_within_watermark,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01 10:00:00", "v": "first"},
        {"k": "a", "ts": "2024-01-01 10:02:00", "v": "redelivery"},  # within 10m
        {"k": "b", "ts": "2024-01-01 10:01:00", "v": "only"},
    ]
    _write_files(src, "b1.json", rows)
    sdf = spark.readStream.schema("k string, ts timestamp, v string").json(str(src))
    out = dedup_within_watermark(sdf, ["k"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["k"], r["v"]) for r in spark.table("wm_dedup").collect()}
    assert got == {("a", "first"), ("b", "only")}

    # batch fallback keeps one row per key too
    bdf = spark.createDataFrame(
        [(r["k"], r["ts"], r["v"]) for r in rows], "k string, ts string, v string"
    )
    assert dedup_within_watermark(bdf, ["k"]).count() == 2
