"""Capstone composition: the full crawl-to-training-data pipeline.

WARC segments → streaming read → HTML extraction + URL canonicalization →
per-batch expectation gate → dedup corpus ingest → batch curation audit →
deterministic train split.  Every stage is covered by its own unit tests;
this test proves the stages actually compose (schemas line up, streaming
hand-offs work, the dedup/gate contracts hold through the chain).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.functions import text as text_fns
from oltp_to_data_warehouse_pipeline_spark.sources.warc import WarcDataSource, write_warc
from oltp_to_data_warehouse_pipeline_spark.streaming.corpus import ingest_documents


def _page(i: int, body: str, tracking: bool = False) -> dict:
    q = "?utm_source=feed" if tracking else ""
    return {
        "warc_type": "response",
        "record_id": f"<urn:uuid:p{i}>",
        "target_uri": f"https://example.com/page/{i}{q}",
        "content_type": "text/html",
        "payload": f"<html><body><p>{body}</p></body></html>".encode(),
    }


def test_crawl_to_training_split(spark, tmp_path):
    segments = tmp_path / "segments"
    segments.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(WarcDataSource)

    body = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    write_warc(
        [
            _page(1, body),
            _page(2, body, tracking=True),   # same page via tracking-param mirror
            _page(3, "completely different and also quite long " + body[::-1]),
            {
                "warc_type": "request",       # non-response records drop at extract
                "record_id": "<urn:uuid:req>",
                "payload": b"GET / HTTP/1.1",
            },
        ],
        str(segments / "seg-000.warc"),
    )

    # stream: WARC -> documents shape (extraction in the scan stage)
    stream = (
        spark.readStream.format("warc")
        .load(str(segments))
        .where(F.col("warc_type") == "response")
        .select(
            F.col("record_id").alias("doc_id"),
            text_fns.canonical_url(F.col("target_uri")).alias("url"),
            text_fns.html_to_text(F.col("payload").cast("string")).alias("text"),
        )
    )
    # dedup corpus ingest keyed on normalized TEXT fingerprint: the mirror
    # page (p2) must collapse against p1 within the batch
    q = ingest_documents(stream, corpus, ckpt)
    q.awaitTermination(120)

    landed = spark.read.parquet(corpus)
    assert landed.count() == 2  # p1 + p3; mirror and request dropped
    urls = {r["url"] for r in landed.select("url").collect()}
    assert urls == {"https://example.com/page/1", "https://example.com/page/3"}

    # a second crawl pass re-delivers the same pages: replay is a no-op
    write_warc([_page(4, body)], str(segments / "seg-001.warc"))  # dup of p1's text
    q = ingest_documents(stream, corpus, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(corpus).count() == 2

    # batch side: curation quality gate passes both long-enough docs, then
    # the deterministic split assigns every kept doc exactly once
    from oltp_to_data_warehouse_pipeline_spark.plans.curation import curate_corpus

    docs = spark.read.parquet(corpus).withColumn(
        "doc_id", F.xxhash64("doc_id")  # curation wants an orderable id
    )
    kept = curate_corpus(docs, quality_min=0.4, lang="en", jaccard_threshold=0.9)
    assert kept.count() == 2
    assert kept.agg(F.min("n_tokens")).first()[0] > 10

    split = F.when(
        (
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
            )
            - 1
        )
        < 13,
        "train",
    ).otherwise("heldout")
    assigned = kept.select("doc_id", split.alias("split"))
    assert assigned.count() == 2
    assert assigned.select("doc_id").distinct().count() == 2  # exactly once each
