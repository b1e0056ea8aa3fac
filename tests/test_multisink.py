"""Multi-sink fanout: one batch computation feeding several sinks with
shared offsets, and the all-or-nothing retry contract."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.streaming.multisink import fanout_sink


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_fanout_feeds_raw_archive_and_rollup_from_one_pass(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    raw = str(tmp_path / "raw")
    rollup = str(tmp_path / "rollup")
    _write(src, "b1.json", [{"k": "a", "v": 1.0}, {"k": "a", "v": 2.0}, {"k": "b", "v": 5.0}])

    def raw_sink(batch, epoch_id):
        batch.write.mode("append").parquet(raw)

    def rollup_sink(batch, epoch_id):
        batch.groupBy("k").agg(F.sum("v").alias("s")).write.mode("append").parquet(rollup)

    stream = spark.readStream.schema("k string, v double").json(str(src))
    q = fanout_sink(stream, [raw_sink, rollup_sink], str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert spark.read.parquet(raw).count() == 3
    got = {r["k"]: r["s"] for r in spark.read.parquet(rollup).collect()}
    assert got == {"a": 3.0, "b": 5.0}

    # second increment flows to BOTH sinks from the same offsets
    _write(src, "b2.json", [{"k": "b", "v": 1.0}])
    q = fanout_sink(stream, [raw_sink, rollup_sink], str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert spark.read.parquet(raw).count() == 4
    assert spark.read.parquet(rollup).count() == 3  # appended per-batch partials


def test_failing_sink_aborts_batch_for_all_sinks(spark, tmp_path):
    """A sink error must fail the whole batch (no silent per-sink skip):
    after the failure neither sink shows the batch, and a retry run
    delivers it to both."""
    src = tmp_path / "src"
    src.mkdir()
    first = str(tmp_path / "first")
    _write(src, "b1.json", [{"k": "a", "v": 1.0}])
    attempts = {"n": 0}

    def first_sink(batch, epoch_id):
        batch.write.mode("append").parquet(first)

    def flaky_sink(batch, epoch_id):
        attempts["n"] += 1
        raise RuntimeError("sink down")

    stream = spark.readStream.schema("k string, v double").json(str(src))
    q = fanout_sink(stream, [first_sink, flaky_sink], str(tmp_path / "ckpt"))
    with pytest.raises(Exception, match="sink down"):
        q.awaitTermination(120)
        q.processAllAvailable()
    q.stop()
    assert attempts["n"] >= 1

    # retry with the flaky sink healed: the SAME batch replays to both
    # (first_sink sees it twice -> its append is the caller's idempotence
    # responsibility, exactly as documented)
    def healed_sink(batch, epoch_id):
        pass

    q = fanout_sink(stream, [first_sink, healed_sink], str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert spark.read.parquet(first).select("k").distinct().count() == 1


def test_gated_sink_blocks_bad_batches_and_passes_good_ones(spark, tmp_path):
    """Streaming inherits the QC-gates-load ordering: a batch violating the
    expectation suite never reaches the sink; a clean batch flows."""
    from oltp_to_data_warehouse_pipeline_spark.operators.expectations import (
        expect_between,
        expect_not_null,
    )
    from oltp_to_data_warehouse_pipeline_spark.streaming.multisink import gated

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    suite = [expect_not_null("k"), expect_between("v", 0.0, 100.0)]

    def sink(batch, epoch_id):
        batch.write.mode("append").parquet(out)

    stream = spark.readStream.schema("k string, v double").json(str(src))

    _write(src, "good.json", [{"k": "a", "v": 1.0}, {"k": "b", "v": 2.0}])
    q = fanout_sink(stream, [gated(sink, suite)], str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2

    # a poisoned batch (null key + out-of-range value) must abort loudly
    _write(src, "bad.json", [{"k": None, "v": 1.0}, {"k": "c", "v": 999.0}])
    q = fanout_sink(stream, [gated(sink, suite)], str(tmp_path / "ck1"))
    with pytest.raises(Exception, match="failed expectations"):
        q.awaitTermination(120)
        q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 2  # nothing landed
