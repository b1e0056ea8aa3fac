"""Streaming HLL register store: incremental maintenance equals the
batch-built registers (register-wise MAX across micro-batches),
ledger-free replay idempotence, store-served window estimates."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import hll
from oltp_to_data_warehouse_pipeline_spark.streaming.sketchstore import (
    maintain_hll_store,
    window_hll_estimate,
)

SCHEMA = "user_id string, ts timestamp"


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, src, store, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = maintain_hll_store(stream, store, ckpt)
    q.awaitTermination(120)


def _events(day: str, users: list[str]) -> list[dict]:
    return [{"user_id": u, "ts": f"{day}T03:00:00"} for u in users]


def _store_rows(spark, store):
    return sorted(
        (str(r["d"]), int(r["j"]), int(r["r"]))
        for r in spark.read.parquet(store).collect()
    )


def _batch_built(spark, rows):
    df = spark.createDataFrame(
        [(r["user_id"], r["ts"]) for r in rows], "user_id string, ts string"
    ).withColumn("d", F.col("ts").cast("date"))
    sk = hll.hll_sketch(df, "user_id", ["d"])
    return sorted(
        (str(r["d"]), int(r["j"]), int(r["r"])) for r in sk.collect()
    )


def test_incremental_hll_store_equals_batch_built(spark, tmp_path):
    """Three micro-batches with overlapping users and split days must
    leave the store identical to sketching everything at once —
    register-wise MAX is associative over any batch split."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    b1 = _events("2026-01-01", [f"u{i}" for i in range(40)])
    b2 = _events("2026-01-01", [f"u{i}" for i in range(20, 60)]) + _events(
        "2026-01-02", [f"v{i}" for i in range(30)]
    )
    b3 = _events("2026-01-02", [f"v{i}" for i in range(10, 50)])
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    _write(src, "b3.json", b3)
    _run(spark, src, store, ckpt)
    assert _store_rows(spark, store) == _batch_built(spark, b1 + b2 + b3)


def test_hll_store_replay_converges(spark, tmp_path):
    """A fresh checkpoint replaying EVERY file (the at-least-once worst
    case) leaves the store byte-identical — MAX is idempotent, no ledger."""
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    _write(src, "b1.json", _events("2026-01-01", [f"u{i}" for i in range(50)]))
    _write(src, "b2.json", _events("2026-01-02", [f"w{i}" for i in range(50)]))
    _run(spark, src, store, str(tmp_path / "ckpt1"))
    want = _store_rows(spark, store)
    _run(spark, src, store, str(tmp_path / "ckpt2"))  # full replay
    assert _store_rows(spark, store) == want


def test_window_hll_estimate_served_from_store(spark, tmp_path):
    """The store-served estimate equals hll_estimate over the same rows
    computed directly, and tracks the true count within 4 sigma; absent
    store and empty range answer one 0.0 row."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    users = [f"u{i}" for i in range(800)]
    _write(src, "b1.json", _events("2026-01-01", users[:400]))
    _write(src, "b2.json", _events("2026-01-02", users[300:]))
    _run(spark, src, store, ckpt)
    est = window_hll_estimate(spark, store, "2026-01-01", "2026-01-02").collect()
    assert len(est) == 1
    got = est[0]["est_distinct"]
    assert abs(got - 800) / 800 < 4 * hll.standard_error()

    # absent store / empty range -> one zero row
    missing = window_hll_estimate(
        spark, str(tmp_path / "never"), "2026-01-01", "2026-01-02"
    ).collect()
    assert len(missing) == 1 and missing[0]["est_distinct"] == 0.0
    empty = window_hll_estimate(spark, store, "1999-01-01", "1999-12-31").collect()
    assert len(empty) == 1 and empty[0]["est_distinct"] == 0.0
