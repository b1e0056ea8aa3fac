"""Streaming observability: ProgressRecorder captures per-batch metrics."""

from __future__ import annotations

import json
import time

from oltp_to_data_warehouse_pipeline_spark.streaming.metrics import ProgressRecorder


def test_progress_recorder_captures_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.json").write_text(
        "\n".join(json.dumps({"k": i, "v": i * 1.0}) for i in range(100)) + "\n"
    )

    rec = ProgressRecorder(keep=16)
    spark.streams.addListener(rec)
    try:
        q = (
            spark.readStream.schema("k long, v double")
            .json(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .queryName("metrics-probe")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; poll briefly
        for _ in range(40):
            if rec.progress(spark, "metrics-probe").count() > 0:
                break
            time.sleep(0.25)
        p = rec.progress(spark, "metrics-probe")
        rows = p.collect()
        assert rows, "no progress captured"
        assert sum(r["num_input_rows"] for r in rows) == 100
        assert all(r["query_name"] == "metrics-probe" for r in rows)
        assert all(r["batch_duration_ms"] >= 0 for r in rows)

        s = rec.summary(spark).collect()
        assert len(s) == 1 and s[0]["total_rows"] == 100 and s[0]["n_batches"] >= 1
    finally:
        spark.streams.removeListener(rec)


def test_progress_ring_is_bounded(spark):
    rec = ProgressRecorder(keep=3)

    class _P:  # minimal stand-in for a progress event payload
        def __init__(self, i):
            self.name = "q"
            self.id = "qid"
            self.batchId = i
            self.timestamp = f"t{i}"
            self.numInputRows = 1
            self.inputRowsPerSecond = 1.0
            self.processedRowsPerSecond = 1.0
            self.durationMs = {"triggerExecution": 5}
            self.stateOperators = []

    class _E:
        def __init__(self, i):
            self.progress = _P(i)

    for i in range(10):
        rec.onQueryProgress(_E(i))
    rows = rec.progress(spark, "q").collect()
    assert [r["batch_id"] for r in rows] == [7, 8, 9]  # last `keep` only
