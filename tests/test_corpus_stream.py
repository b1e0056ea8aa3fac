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
