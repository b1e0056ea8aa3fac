"""WARC data source: crawl files queryable through spark.read.format('warc').

Covers the pure parser (record framing, gzip multi-member, truncation
refusal), the Spark DataSource integration (per-file partitions, schema),
and the corpus-pipeline composition: WARC → documents-shaped relation →
exact dedup — the ingest path a Common Crawl segment takes into this
engine.
"""

from __future__ import annotations

import io

import pytest

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.sources.warc import (
    WarcDataSource,
    iter_warc_records,
    write_warc,
)

RECORDS = [
    {
        "warc_type": "response",
        "record_id": "<urn:uuid:r1>",
        "target_uri": "http://example.com/a",
        "warc_date": "2026-01-01T00:00:00Z",
        "content_type": "text/html",
        "payload": b"<html>alpha beta gamma</html>",
    },
    {
        "warc_type": "response",
        "record_id": "<urn:uuid:r2>",
        "target_uri": "http://example.com/b",
        "warc_date": "2026-01-01T00:00:01Z",
        "content_type": "text/html",
        "payload": b"<html>alpha beta gamma</html>",  # exact dup of r1
    },
    {
        "warc_type": "warcinfo",
        "record_id": "<urn:uuid:meta>",
        "payload": b"software: test\r\n",
    },
]


def test_parser_roundtrip_plain_and_gzip(tmp_path):
    for compress, name in ((False, "a.warc"), (True, "a.warc.gz")):
        p = str(tmp_path / name)
        write_warc(RECORDS, p, compress=compress)
        import gzip

        stream = gzip.open(p, "rb") if compress else open(p, "rb")
        with stream:
            got = list(iter_warc_records(stream))
        assert [g["record_id"] for g in got] == ["<urn:uuid:r1>", "<urn:uuid:r2>", "<urn:uuid:meta>"]
        assert got[0]["payload"] == RECORDS[0]["payload"]
        assert got[0]["target_uri"] == "http://example.com/a"
        assert got[2]["warc_type"] == "warcinfo"


def test_parser_refuses_truncation_and_garbage():
    # a record whose payload is cut short must fail loudly, not resync
    raw = io.BytesIO(
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <x>\r\n"
        b"Content-Length: 100\r\n\r\nshort"
    )
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(raw))
    junk = io.BytesIO(b"NOT-A-WARC\r\n")
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(junk))


def test_spark_reads_warc_with_per_file_partitions(spark, tmp_path):
    write_warc(RECORDS, str(tmp_path / "seg1.warc"), compress=False)
    write_warc(RECORDS[:1], str(tmp_path / "seg2.warc.gz"), compress=True)
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4
    # one partition per file
    assert df.rdd.getNumPartitions() == 2
    assert {r["source_file"].rsplit("/", 1)[-1] for r in rows} == {"seg1.warc", "seg2.warc.gz"}
    r1 = [r for r in rows if r["record_id"] == "<urn:uuid:r1>"]
    assert r1 and bytes(r1[0]["payload"]) == RECORDS[0]["payload"]
    assert r1[0]["content_length"] == len(RECORDS[0]["payload"])


def test_warc_to_corpus_dedup_composition(spark, tmp_path):
    """The ingest pipeline: crawl responses → documents-shaped relation →
    normalized-fingerprint exact dedup (r2's duplicate page collapses)."""
    from oltp_to_data_warehouse_pipeline_spark.functions import text as text_fns

    write_warc(RECORDS, str(tmp_path / "seg.warc"), compress=False)
    spark.dataSource.register(WarcDataSource)
    docs = (
        spark.read.format("warc")
        .load(str(tmp_path / "seg.warc"))
        .where(F.col("warc_type") == "response")
        .select(
            F.col("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("text"),
        )
        .withColumn("fp", text_fns.normalized_fingerprint("text"))
    )
    kept = docs.dropDuplicates(["fp"])
    assert docs.count() == 2 and kept.count() == 1


def test_streaming_warc_tail_picks_up_new_segments(spark, tmp_path):
    """readStream over a crawl directory: batch 1 sees the initial segment,
    a new segment landing between triggers arrives in the next batch, and a
    checkpoint restart does not re-deliver committed files."""
    src = tmp_path / "segments"
    src.mkdir()
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    write_warc(RECORDS[:1], str(src / "seg-000.warc"), compress=False)
    spark.dataSource.register(WarcDataSource)

    def drain():
        q = (
            spark.readStream.format("warc")
            .load(str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 1

    # second segment lands; only IT is delivered on the next run
    write_warc(RECORDS[1:], str(src / "seg-001.warc.gz"), compress=True)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 3  # 1 + 2, no re-delivery of seg-000
    assert got.select("record_id").distinct().count() == 3

    # replay with no new data: nothing is re-delivered
    drain()
    assert spark.read.parquet(out).count() == 3


def test_crawl_to_corpus_streaming_pipeline(spark, tmp_path):
    """The flagship ingest composition, end to end and ALL streaming: WARC
    segments land in a directory → readStream('warc') → normalize to the
    documents shape → `corpus.ingest_documents` dedup-appends into the
    stored corpus.  Duplicates are dropped both within a batch and against
    the corpus across separate stream runs."""
    from oltp_to_data_warehouse_pipeline_spark.streaming.corpus import ingest_documents

    src = tmp_path / "segments"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(WarcDataSource)

    def run_ingest():
        stream = (
            spark.readStream.format("warc")
            .load(str(src))
            .where(F.col("warc_type") == "response")
            .select(
                F.col("record_id").alias("doc_id"),
                F.col("payload").cast("string").alias("text"),
            )
        )
        q = ingest_documents(stream, corpus, ckpt)
        q.awaitTermination(120)

    # batch 1: r1 + its exact duplicate r2 -> one row lands
    write_warc(RECORDS, str(src / "seg-000.warc"), compress=False)
    run_ingest()
    assert spark.read.parquet(corpus).count() == 1

    # batch 2: a NEW page + ANOTHER copy of the old one -> only the new lands
    write_warc(
        [
            {
                "warc_type": "response",
                "record_id": "<urn:uuid:r3>",
                "target_uri": "http://example.com/c",
                "payload": b"<html>completely new page</html>",
            },
            {
                "warc_type": "response",
                "record_id": "<urn:uuid:r4>",
                "target_uri": "http://example.com/a-mirror",
                "payload": RECORDS[0]["payload"],  # corpus already has this text
            },
        ],
        str(src / "seg-001.warc"),
        compress=False,
    )
    run_ingest()
    got = spark.read.parquet(corpus)
    assert got.count() == 2
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == [
        "<urn:uuid:r1>", "<urn:uuid:r3>",
    ]


def test_warc_type_filter_pushdown(spark, tmp_path):
    """`warc_type = 'response'` pushes into the parser: non-matching records
    are dropped before their payload crosses the Arrow boundary.  Unit level
    pins the reader contract; query level pins end-to-end correctness."""
    from pyspark.sql.datasource import EqualTo

    from oltp_to_data_warehouse_pipeline_spark.sources.warc import (
        WarcReaderWithPushdown,
        _FilePartition,
    )

    p = str(tmp_path / "seg.warc")
    write_warc(RECORDS, p, compress=False)

    reader = WarcReaderWithPushdown({"path": p})
    remaining = reader.pushFilters([EqualTo(("warc_type",), "response")])
    assert reader.type_filter == "response"
    assert list(remaining)  # filter re-returned: Spark still applies it post-scan
    rows = list(reader.read(_FilePartition(p)))
    assert len(rows) == 2 and all(r[0] == "response" for r in rows)

    # end to end through the planner
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(p).where(F.col("warc_type") == "response")
    assert df.count() == 2


# --- property: writer -> parser roundtrip over arbitrary payloads -----------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=5),
    compress=st.booleans(),
)
def test_warc_roundtrip_property(tmp_path_factory, payloads, compress):
    import gzip

    recs = [
        {"warc_type": "response", "record_id": f"<urn:uuid:p{i}>", "payload": p}
        for i, p in enumerate(payloads)
    ]
    p = str(tmp_path_factory.mktemp("warcprop") / ("x.warc.gz" if compress else "x.warc"))
    write_warc(recs, p, compress=compress)
    stream = gzip.open(p, "rb") if compress else open(p, "rb")
    with stream:
        got = list(iter_warc_records(stream))
    assert [g["payload"] for g in got] == payloads
    assert [g["record_id"] for g in got] == [r["record_id"] for r in recs]
