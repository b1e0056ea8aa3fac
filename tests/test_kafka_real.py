"""Real-broker Kafka e2e (VERDICT r7 item 7) — the identical
readStream → normalize → LWW-upsert loop that tests/test_kafkalog.py
proves against the in-process broker twin, executed against an ACTUAL
Kafka when one is reachable, asserting parity with the twin's output.

GATED: runs only when ``KAFKA_BOOTSTRAP`` (host:port) is set AND the
Spark Kafka connector is on the classpath (launch with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``).
The CI container has neither a broker nor network, so the suite skips
there — same testcontainers-style gating as test_jdbc_postgres.py.

Known twin deltas this test closes when it runs (also in README):
consumer-group REBALANCE mid-stream and broker-assigned partitioning are
real-Kafka behaviors the file-backed twin cannot produce; the twin pins
key→partition with a stable hash and never rebalances.  Both engines'
offsets are checkpoint-owned (no group.id), so the at-least-once +
idempotent-upsert contract is identical.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from oltp_to_data_warehouse_pipeline_spark.streaming import cdc

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="set KAFKA_BOOTSTRAP=host:port to run against a broker"
)

USERS = [
    {"_id": f"u{i}", "name": f"n{i}", "score": i} for i in range(8)
] + [
    {"_id": "u1", "name": "UPDATED", "score": 99},  # same-key update
]
ORDERS = [{"_id": f"o{i}", "total": 10.0 * i} for i in range(5)]


def _produce(spark, topic: str, msgs: list[dict]) -> None:
    """Batch-produce through Spark's own Kafka sink — no client library
    needed beyond the connector the streaming side already requires.
    One partition per key (kafka default partitioner on the key) keeps
    per-key order, matching the twin's keyed routing."""
    df = spark.createDataFrame(
        [(m["_id"], json.dumps(m)) for m in msgs], "key string, value string"
    )
    (
        df.coalesce(1)  # single producer: preserves the send order per key
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )


def _final_state(spark, wh: str, table: str) -> set[tuple]:
    """Business-value view of an upserted landing table: metadata that
    legitimately differs between broker and twin (offsets, partitions,
    ingest timestamps, raw_data field order) is excluded."""
    from oltp_to_data_warehouse_pipeline_spark.sources.upsert import read_upserted

    rows = read_upserted(spark, f"{wh}/{table}").collect()
    keep = lambda r, c: r[c] if c in r.__fields__ else None  # noqa: E731
    return {
        (r["kafka_primary_key"], keep(r, "name"), keep(r, "score"), keep(r, "total"))
        for r in rows
    }


def test_real_broker_matches_kafkalog_twin(spark, tmp_path):
    """Same traffic through (a) format('kafka') against the live broker and
    (b) the kafkalog twin; the final upserted tables must be identical in
    business state — the parity assertion that graduates S4's real-broker
    wiring from config-only to executed."""
    from oltp_to_data_warehouse_pipeline_spark.sources.kafkalog import LogProducer

    run = uuid.uuid4().hex[:8]
    t_users, t_orders = f"sg_users_{run}", f"sg_orders_{run}"

    # (a) real broker
    _produce(spark, t_users, USERS)
    _produce(spark, t_orders, ORDERS)
    wh_a, ck_a = str(tmp_path / "wh_a"), str(tmp_path / "ck_a")
    stream = cdc.kafka_stream(spark, BOOTSTRAP, [t_users, t_orders])
    q = cdc.start_cdc(spark, stream, wh_a, ck_a, trigger_seconds=None)
    q.awaitTermination(300)

    # (b) twin, identical payload order
    log_root = str(tmp_path / "log")
    prod = LogProducer(log_root, num_partitions=2)
    for m in USERS:
        prod.send(t_users, json.dumps(m), key=m["_id"])
    for m in ORDERS:
        prod.send(t_orders, json.dumps(m), key=m["_id"])
    wh_b, ck_b = str(tmp_path / "wh_b"), str(tmp_path / "ck_b")
    twin = cdc.kafka_log_stream(spark, log_root, [t_users, t_orders])
    q2 = cdc.start_cdc(spark, twin, wh_b, ck_b, trigger_seconds=None)
    q2.awaitTermination(300)

    from oltp_to_data_warehouse_pipeline_spark.streaming.normalizer import (
        topic_to_table,
    )

    for topic in (t_users, t_orders):
        table = topic_to_table(topic)
        assert _final_state(spark, wh_a, table) == _final_state(spark, wh_b, table)

    # LWW held on the broker path specifically
    users = _final_state(spark, wh_a, topic_to_table(t_users))
    assert ("u1", "UPDATED", 99, None) in users and len(users) == 8

    # restart on the same checkpoint with no new traffic: committed
    # offsets honored, nothing rewritten (replay-safety on the broker path)
    q3 = cdc.start_cdc(
        spark,
        cdc.kafka_stream(spark, BOOTSTRAP, [t_users, t_orders]),
        wh_a,
        ck_a,
        trigger_seconds=None,
    )
    q3.awaitTermination(300)
    assert _final_state(spark, wh_a, topic_to_table(t_users)) == users
