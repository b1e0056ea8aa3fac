"""Kafka source wiring (ST1/ST2: the format("kafka") option dict, verified
against the reference consumer's settings) and graceful shutdown (ST6).

The full CDC loop — readStream → normalize → upsert with offset
checkpointing and replay — is e2e-tested against the in-process broker in
tests/test_kafkalog.py; this module keeps the real-broker option parity
pinned."""

from __future__ import annotations

import json

import pytest

from oltp_to_data_warehouse_pipeline_spark.streaming import cdc


def test_kafka_reader_options_match_reference_consumer():
    """`mongo_postgres_cdc.py:27-32,382-401` semantics, key for key."""
    opts = cdc.kafka_reader_options("broker1:9092,broker2:9092", ["users", "orders.v1"], 500)
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "users,orders.v1"          # multi-topic, one group
    assert opts["startingOffsets"] == "earliest"            # auto_offset_reset analog
    assert opts["maxOffsetsPerTrigger"] == "500"            # max_poll_records analog
    # Spark owns group management + offset commits via the checkpoint (ST3):
    # a manual group.id would fight the checkpoint's fenced group.
    assert "kafka.group.id" not in opts and "group.id" not in opts


def test_kafka_reader_options_reject_empty_topics():
    with pytest.raises(ValueError, match="topic"):
        cdc.kafka_reader_options("b:9092", [])


def test_graceful_shutdown_drains_inflight_batch(spark, tmp_path):
    """ST6 over a file-source stream: rows written before shutdown() must be
    in the landing table after it returns; the query must be stopped."""
    src = tmp_path / "src"
    src.mkdir()
    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    (src / "a.json").write_text(
        "\n".join(json.dumps({"value": json.dumps({"id": str(i), "v": i}), "topic": "users"}) for i in range(5))
    )
    stream = (
        spark.readStream.schema("value string, topic string")
        .json(str(src))
    )
    # long processingTime trigger: shutdown() must not wait a full interval
    q = cdc.start_cdc(spark, stream, wh, ckpt, trigger_seconds=1)
    assert cdc.shutdown(q, timeout_s=120.0)
    assert not q.isActive
    from oltp_to_data_warehouse_pipeline_spark.sources.upsert import read_upserted

    assert read_upserted(spark, f"{wh}/users").count() == 5
