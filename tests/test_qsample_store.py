"""Streaming quantile-sample store: incremental maintenance equals the
batch-built sample (bottom-k merge over micro-batches with the
(d, h, v) replay dedup), ledger-free replay idempotence, store-served
window quantiles."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import qsketch
from oltp_to_data_warehouse_pipeline_spark.streaming.sketchstore import (
    maintain_qsample_store,
    window_quantiles,
)

SCHEMA = "event_id long, value double, ts timestamp"
K = 8


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, src, store, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = maintain_qsample_store(stream, store, ckpt, k=K)
    q.awaitTermination(120)


def _events(day: str, ids: list[int]) -> list[dict]:
    return [
        {"event_id": i, "value": float(i * 7 % 100), "ts": f"{day}T0{i % 9}:00:00"}
        for i in ids
    ]


def _store_rows(spark, store):
    return sorted(
        (str(r["d"]), int(r["h"]), float(r["v"]))
        for r in spark.read.parquet(store).collect()
    )


def _batch_built(spark, rows):
    df = spark.createDataFrame(
        [(r["event_id"], r["value"], r["ts"]) for r in rows],
        "event_id long, value double, ts string",
    ).withColumn("d", F.col("ts").cast("date"))
    sk = qsketch.qsample_sketch(df, "event_id", "value", ["d"], K, prefilter=False)
    return sorted(
        (str(r["d"]), int(r["h"]), float(r["v"])) for r in sk.collect()
    )


def test_incremental_qstore_equals_batch_built(spark, tmp_path):
    """Per-batch sample-merge across micro-batches must produce the SAME
    store as one batch sample over all events — the bottom-k merge
    theorem at the micro-batch grain, days split across batches, with a
    re-delivered overlap (ids 20-29 appear in both batches on day 1)
    absorbed by the (d, h, v) dedup."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    b1 = _events("2026-01-01", list(range(30)))
    b2 = _events("2026-01-01", list(range(20, 50))) + _events(
        "2026-01-02", list(range(200, 205))
    )
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    _run(spark, src, store, ckpt)
    dedup = {(r["event_id"], r["value"], r["ts"]): r for r in b1 + b2}
    assert _store_rows(spark, store) == _batch_built(spark, list(dedup.values()))


def test_qstore_replay_converges(spark, tmp_path):
    """A fresh checkpoint re-delivers every batch; the (d, h, v)-dedup'd
    merge must leave the store identical (no ledger)."""
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "store")
    _write(src, "b1.json", _events("2026-01-01", list(range(40))))
    _write(src, "b2.json", _events("2026-01-02", list(range(100, 115))))
    _run(spark, src, store, str(tmp_path / "ckpt1"))
    before = _store_rows(spark, store)
    _run(spark, src, store, str(tmp_path / "ckpt2"))  # full replay
    assert _store_rows(spark, store) == before


def test_window_quantiles_served_from_store(spark, tmp_path):
    """Small-m days are exhaustive (m < k ⇒ the sample IS the data), so
    the store-served quantiles are the exact order statistics."""
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    rows = [
        {"event_id": i, "value": v, "ts": "2026-01-01T01:00:00"}
        for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 50.0])
    ]
    _write(src, "b1.json", rows)
    _run(spark, src, store, ckpt)
    out = window_quantiles(
        spark, store, "2026-01-01", "2026-01-02", {"q0": 0.0, "q50": 0.5, "q100": 1.0}, k=K
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["m"] == 5 and r["q0"] == 10.0 and r["q50"] == 30.0 and r["q100"] == 50.0


def test_window_quantiles_guards(spark, tmp_path):
    """Absent store and empty range both answer ONE row with m=0 and NULL
    quantiles — never a crash or an empty relation."""
    missing = str(tmp_path / "never_written")
    out = window_quantiles(
        spark, missing, "2026-01-01", "2026-01-02", {"q50": 0.5}, k=K
    ).collect()
    assert len(out) == 1 and out[0]["m"] == 0 and out[0]["q50"] is None
    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    _write(src, "b1.json", _events("2026-01-01", [1, 2, 3]))
    _run(spark, src, store, ckpt)
    out = window_quantiles(
        spark, store, "1999-01-01", "1999-12-31", {"q50": 0.5}, k=K
    ).collect()
    assert len(out) == 1 and out[0]["m"] == 0 and out[0]["q50"] is None


def test_serving_k_above_store_k_is_refused(spark, tmp_path):
    """The store records its maintenance k; serving with a larger k must
    raise instead of silently degrading (day sketches were truncated at
    the store k, so a larger merged bottom-k is no longer a uniform
    bottom-k of the raw union).  Smaller k keeps working.  Round-8
    advisor finding."""
    import pytest

    src = tmp_path / "src"
    src.mkdir()
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    _write(src, "b1.json", _events("2026-01-01", list(range(20))))
    _run(spark, src, store, ckpt)
    with pytest.raises(ValueError, match="maintenance k"):
        window_quantiles(
            spark, store, "2026-01-01", "2026-01-02", {"q50": 0.5}, k=K * 2
        )
    out = window_quantiles(
        spark, store, "2026-01-01", "2026-01-02", {"q50": 0.5}, k=K // 2
    ).collect()
    assert len(out) == 1 and out[0]["m"] == K // 2


def test_mixed_maintenance_k_is_refused(spark, tmp_path):
    """A second maintainer with a different k must be refused — mixed-k
    day partitions would silently break the merge theorem."""
    import pytest

    from oltp_to_data_warehouse_pipeline_spark.streaming.sketchstore import (
        merge_batch_into_qstore,
    )

    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(i, float(i), "2026-01-01 01:00:00") for i in range(10)],
        "event_id long, value double, ts string",
    )
    merge_batch_into_qstore(batch, store, "event_id", "value", "ts", k=K)
    with pytest.raises(ValueError, match="k="):
        merge_batch_into_qstore(batch, store, "event_id", "value", "ts", k=K + 1)


def test_legacy_markerless_store_refuses_stamping(spark, tmp_path):
    """A store with data but no _sketch_k marker (pre-marker era) must
    NOT be silently stamped with the current job's k — the operator
    migrates explicitly (round-9 review finding)."""
    import pytest

    from oltp_to_data_warehouse_pipeline_spark import fs
    from oltp_to_data_warehouse_pipeline_spark.streaming.sketchstore import (
        _K_MARKER,
        merge_batch_into_qstore,
    )

    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        [(i, float(i), "2026-01-01 01:00:00") for i in range(10)],
        "event_id long, value double, ts string",
    )
    merge_batch_into_qstore(batch, store, "event_id", "value", "ts", k=K)
    # simulate a legacy store: delete the marker, keep the data
    fs.delete(spark, fs.join(store, _K_MARKER))
    with pytest.raises(ValueError, match="predates the k marker"):
        merge_batch_into_qstore(batch, store, "event_id", "value", "ts", k=K)
    # explicit migration re-enables maintenance
    fs.write_text(spark, fs.join(store, _K_MARKER), str(K))
    merge_batch_into_qstore(batch, store, "event_id", "value", "ts", k=K)
