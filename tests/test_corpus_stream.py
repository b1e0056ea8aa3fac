"""Streaming corpus ingestion: cross-batch exact dedup, replay idempotence
without a batch ledger."""

from __future__ import annotations

import json

from oltp_to_data_warehouse_pipeline_spark.streaming.corpus import ingest_documents

SCHEMA = "doc_id long, text string"


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, src, corpus, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = ingest_documents(stream, corpus, ckpt)
    q.awaitTermination(120)


def test_streaming_ingest_dedups_within_and_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    corpus, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")

    _write(src, "b1.json", [
        {"doc_id": 1, "text": "alpha beta"},
        {"doc_id": 2, "text": "ALPHA   beta"},   # normalized dup of 1 (in-batch)
        {"doc_id": 3, "text": "gamma"},
    ])
    _run(spark, src, corpus, ckpt)
    got = {(r["doc_id"], r["fp"] is not None) for r in spark.read.parquet(corpus).collect()}
    assert {d for d, _ in got} == {1, 3}

    # batch 2: cross-batch dup of doc 3 + a genuinely new doc
    _write(src, "b2.json", [
        {"doc_id": 9, "text": "  gamma  "},      # dup of 3 across batches
        {"doc_id": 10, "text": "delta"},
    ])
    _run(spark, src, corpus, ckpt)
    docs = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert docs == [1, 3, 10]

    # replay from scratch (fresh checkpoint = every batch re-delivered):
    # the anti-join predicate makes the whole replay a no-op
    _run(spark, src, corpus, str(tmp_path / "ckpt2"))
    docs2 = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert docs2 == [1, 3, 10]


def test_watermarked_ingest_bounded_state_dedup_and_replay(spark, tmp_path):
    """The bounded-state variant: dropDuplicatesWithinWatermark drops
    duplicates whose event times fall within the watermark delay (within
    AND across micro-batches), keeps duplicates separated by more than the
    delay (the documented horizon trade), and a kill/restart on the same
    checkpoint resumes the dedup state instead of re-appending."""
    from oltp_to_data_warehouse_pipeline_spark.streaming.corpus import (
        ingest_documents_watermarked,
    )

    schema = "doc_id long, text string, ts timestamp"
    src = tmp_path / "src"
    src.mkdir()
    corpus, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = ingest_documents_watermarked(
            stream, corpus, ckpt, event_time_col="ts", delay="1 hour"
        )
        q.awaitTermination(120)

    _write(src, "b1.json", [
        {"doc_id": 1, "text": "alpha beta", "ts": "2024-01-01T10:00:00"},
        {"doc_id": 2, "text": "ALPHA  beta", "ts": "2024-01-01T10:10:00"},  # in-batch dup
        {"doc_id": 3, "text": "gamma", "ts": "2024-01-01T10:20:00"},
    ])
    run()
    docs = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert docs == [1, 3]

    # restart on the SAME checkpoint: a cross-run dup inside the horizon is
    # dropped by the restored state
    _write(src, "b2.json", [
        {"doc_id": 9, "text": " gamma ", "ts": "2024-01-01T10:30:00"},   # dup, in horizon
        {"doc_id": 10, "text": "delta", "ts": "2024-01-01T10:40:00"},
    ])
    run()
    docs = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert docs == [1, 3, 10]

    # advance the watermark far past every stored fingerprint's expiry (the
    # watermark a batch sees is the one the PREVIOUS batch advanced to, so
    # the eviction needs its own batch)...
    _write(src, "b3.json", [
        {"doc_id": 11, "text": "epsilon", "ts": "2024-06-01T00:00:00"},
    ])
    run()
    # ...then a duplicate of doc 1 arriving 5 months after its twin LANDS:
    # bounded state means the old fingerprint has been evicted — the
    # documented horizon trade vs the anti-join path
    _write(src, "b4.json", [
        {"doc_id": 12, "text": "alpha beta", "ts": "2024-06-01T00:30:00"},
    ])
    run()
    docs = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert docs == [1, 3, 10, 11, 12]

    # replay the same files on the same checkpoint: the file-source offsets
    # and sink commit log make it a no-op
    run()
    docs = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert docs == [1, 3, 10, 11, 12]
