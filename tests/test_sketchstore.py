"""Streaming KMV sketch store: incremental maintenance equals the
batch-built sketch (the merge theorem over micro-batches), replay
idempotence without a ledger, store-served window estimates."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import kmv
from oltp_to_data_warehouse_pipeline_spark.streaming.sketchstore import (
    maintain_kmv_store,
    window_estimate,
)

SCHEMA = "event_id long, user_id long, ts timestamp"
K = 8


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, src, store, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = maintain_kmv_store(stream, store, ckpt, k=K)
    q.awaitTermination(120)


def _events(day: str, users: list[int], base: int) -> list[dict]:
    return [
        {"event_id": base + i, "user_id": u, "ts": f"{day}T0{i % 9}:00:00"}
        for i, u in enumerate(users)
    ]


def _store_rows(spark, store):
    return sorted(
        (str(r["d"]), int(r["h"])) for r in spark.read.parquet(store).collect()
    )


def _batch_built(spark, rows):
    df = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["ts"]) for r in rows],
        "event_id long, user_id long, ts string",
    ).withColumn("d", F.col("ts").cast("date"))
    sk = kmv.kmv_sketch(df, "user_id", ["d"], k=K, prefilter=False)
    return sorted((str(r["d"]), int(r["h"])) for r in sk.collect())


def test_incremental_store_equals_batch_built(spark, tmp_path):
    """Per-batch sketch-merge across micro-batches must produce the SAME
    store as one batch sketch over all events — the merge theorem applied
    at the micro-batch grain (days split across batches included)."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    b1 = _events("2026-01-01", list(range(30)), 0)
    b2 = _events("2026-01-01", list(range(20, 50)), 100) + _events(
        "2026-01-02", list(range(5)), 200
    )
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    _run(spark, src, store, ckpt)
    assert _store_rows(spark, store) == _batch_built(spark, b1 + b2)


def test_replay_from_scratch_converges(spark, tmp_path):
    """A fresh checkpoint re-delivers every batch; the idempotent merge
    must leave the store byte-identical (no ledger needed)."""
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    b1 = _events("2026-01-01", list(range(40)), 0)
    b2 = _events("2026-01-02", list(range(15)), 100)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    _run(spark, src, store, str(tmp_path / "ckpt1"))
    before = _store_rows(spark, store)
    _run(spark, src, store, str(tmp_path / "ckpt2"))  # full replay
    assert _store_rows(spark, store) == before


def test_untouched_day_partitions_survive_overwrite(spark, tmp_path):
    """Dynamic partition overwrite must rewrite ONLY the days a batch
    touches — day-1 rows written by batch 1 must still be present (and
    unchanged) after a batch that touches only day 2."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    b1 = _events("2026-01-01", list(range(25)), 0)
    _write(src, "b1.json", b1)
    _run(spark, src, store, ckpt)
    day1 = [r for r in _store_rows(spark, store) if r[0] == "2026-01-01"]
    _write(src, "b2.json", _events("2026-01-02", list(range(10)), 100))
    _run(spark, src, store, ckpt)
    after = [r for r in _store_rows(spark, store) if r[0] == "2026-01-01"]
    assert after == day1
    assert any(r[0] == "2026-01-02" for r in _store_rows(spark, store))


def test_window_estimate_served_from_store(spark, tmp_path):
    """The store answers window distincts without raw data: small-m days
    are exact (m < k ⇒ exhaustive sketch), and the two-day window is the
    distinct union, not the sum."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    # 5 users on day 1, same 5 plus 2 new on day 2 -> union is 7, sum is 12
    _write(src, "b1.json", _events("2026-01-01", [1, 2, 3, 4, 5], 0))
    _write(src, "b2.json", _events("2026-01-02", [1, 2, 3, 4, 5, 6, 7], 100))
    _run(spark, src, store, ckpt)
    est = window_estimate(spark, store, "2026-01-01", "2026-01-02", k=K)
    assert est.collect()[0]["est_distinct"] == 7
    one = window_estimate(spark, store, "2026-01-02", "2026-01-02", k=K)
    assert one.collect()[0]["est_distinct"] == 7


def test_window_estimate_guards(spark, tmp_path):
    """Absent store and no-days-in-range must both answer ONE row with 0 —
    not a crash (PATH_NOT_FOUND) or an empty relation a caller can't
    index into."""
    missing = str(tmp_path / "never_written")
    assert window_estimate(spark, missing, "2026-01-01", "2026-01-02", k=K).collect()[
        0
    ]["est_distinct"] == 0
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    _write(src, "b1.json", _events("2026-01-01", [1, 2, 3], 0))
    _run(spark, src, store, ckpt)
    out = window_estimate(spark, store, "1999-01-01", "1999-12-31", k=K).collect()
    assert len(out) == 1 and out[0]["est_distinct"] == 0


def test_null_timestamps_excluded(spark, tmp_path):
    """Events with a NULL ts have no day: they must not create a NULL
    store partition (which would also dodge touched-day pruning)."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    rows = _events("2026-01-01", [1, 2, 3], 0) + [
        {"event_id": 99, "user_id": 9, "ts": None}
    ]
    _write(src, "b1.json", rows)
    _run(spark, src, store, ckpt)
    days = {str(r["d"]) for r in spark.read.parquet(store).select("d").collect()}
    assert days == {"2026-01-01"}
