"""As-of join semantics + multimodal column plumbing."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.functions import multimodal
from oltp_to_data_warehouse_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "t1"), (1, _ts("2024-01-01 12:00:00"), "t2"),
         (2, _ts("2024-01-01 10:00:00"), "t3")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 100.0), (1, _ts("2024-01-01 11:30:00"), 200.0),
         (2, _ts("2024-01-01 11:00:00"), 300.0)],
        ["k", "rts", "price"],
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    got = {r["tag"]: (r["price"], r["rts"]) for r in out.collect()}
    assert got["t1"] == (100.0, _ts("2024-01-01 09:00:00"))
    assert got["t2"] == (200.0, _ts("2024-01-01 11:30:00"))
    assert got["t3"] == (None, None)           # right row is later -> no match


def test_asof_join_tie_inclusive(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), "t")], ["k", "ts", "tag"])
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 5.0)], ["k", "rts", "v"])
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert out.first()["v"] == 5.0


def test_asof_join_null_payload_no_lookthrough(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 12:00:00"), "t")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0), (1, _ts("2024-01-01 11:00:00"), None)],
        "k: long, rts: timestamp, v: double",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    row = out.first()
    # nearest right row has NULL payload — must NOT look through to 10:00
    assert row["v"] is None and row["rts"] == _ts("2024-01-01 11:00:00")


def _media(spark):
    rows = [(1, b"\x89PNG-fake-bytes-1"), (2, b"\x89PNG-fake-bytes-2"), (3, None)]
    return spark.createDataFrame(rows, "media_id: long, content: binary")


def test_attach_metadata(spark):
    df = multimodal.attach_metadata(_media(spark), "content", "image", "png")
    row = df.where("media_id = 1").first()
    assert row["media_meta"]["media_type"] == "image"
    assert row["media_meta"]["size_bytes"] == 17
    assert row["media_meta"]["width"] is None


def test_decode_stub_raises_without_codec():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"x")


def test_fake_decode_deterministic():
    a = multimodal.fake_decode(b"abc", dim=8)
    assert a == multimodal.fake_decode(b"abc", dim=8)
    assert a != multimodal.fake_decode(b"abd", dim=8)
    assert len(a) == 8 and all(0 <= x < 1 for x in a)


def test_extract_features_mapinpandas(spark):
    out = multimodal.extract_features(_media(spark), dim=4)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows[1]["feature"]) == 4
    assert rows[1]["content_hash"] != rows[2]["content_hash"]
    assert rows[3]["feature"] is None and rows[3]["content_hash"] is None
    # distributed result == local fake codec (plumbing is lossless)
    local = multimodal.fake_decode(b"\x89PNG-fake-bytes-1", dim=4)
    assert [pytest.approx(x) for x in rows[1]["feature"]] == local


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, b"v")], "media_id: long, content: binary")
    df = multimodal.attach_metadata(df, "content", "video", "mp4")
    df = df.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(3500).cast("bigint")),
    )
    out = multimodal.frame_sample_plan(df, "media_id", every_ms=1000)
    assert [r["frame_ts_ms"] for r in out.collect()] == [0, 1000, 2000, 3000]


def test_resize_images_mapinpandas(spark):
    from oltp_to_data_warehouse_pipeline_spark.functions import multimodal as mm

    df = spark.createDataFrame(
        [(1, b"imagebytes-1"), (2, b"imagebytes-2"), (3, None)],
        "media_id: long, content: binary",
    )
    out = mm.resize_images(df, width=4, height=2).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3}
    # realized dims recorded; payload is 4*w*h bytes of deterministic output
    assert by_id[1]["width"] == 4 and by_id[1]["height"] == 2
    assert len(by_id[1]["content"]) == 4 * 4 * 2
    assert by_id[3]["content"] is None
    # deterministic: same input -> same bytes; different input -> different
    again = {r["media_id"]: r for r in mm.resize_images(df, 4, 2).collect()}
    assert bytes(again[1]["content"]) == bytes(by_id[1]["content"])
    assert bytes(by_id[1]["content"]) != bytes(by_id[2]["content"])


def test_audio_chunk_plan(spark):
    from oltp_to_data_warehouse_pipeline_spark.functions import multimodal as mm

    df = spark.createDataFrame([(1, b"x")], "media_id: long, content: binary")
    df = mm.attach_metadata(df, "content", "audio", "wav")
    df = df.withColumn(
        "media_meta",
        F.col("media_meta").withField("duration_ms", F.lit(70_000).cast("bigint")),
    )
    out = sorted(
        (r["chunk_start_ms"], r["chunk_end_ms"])
        for r in mm.audio_chunk_plan(df, "media_id", chunk_ms=30_000).collect()
    )
    # 70s -> [0,30s), [30,60s), [60,70s]
    assert out == [(0, 30_000), (30_000, 60_000), (60_000, 70_000)]
    # overlapping chunks: step = 20s
    out2 = sorted(
        r["chunk_start_ms"]
        for r in mm.audio_chunk_plan(df, "media_id", chunk_ms=30_000, overlap_ms=10_000).collect()
    )
    assert out2 == [0, 20_000, 40_000, 60_000]


def test_media_to_ann_pipeline_end_to_end(spark, tmp_path):
    """Composition: binary media → Arrow-batched feature extraction → IVF
    index on disk → partition-pruned top-k probe.  The full multimodal
    retrieval path with the stub codec standing in for a real encoder —
    every Spark-side seam (schemas, partitioning, index layout, probe
    join) is the production one."""
    from oltp_to_data_warehouse_pipeline_spark.operators import similarity

    media = spark.createDataFrame(
        [(i, bytes([i % 7] * (50 + i))) for i in range(40)],
        "media_id long, content binary",
    )
    feats = multimodal.extract_features(media, dim=8)
    emb = feats.select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").cast("array<float>").alias("embedding"),
    )
    centroids = similarity.ivf_centroids(emb, k=3, iters=1)
    path = str(tmp_path / "media_ivf")
    similarity.ivf_write_index(emb, path, centroids)

    q = emb.where("vec_id = 0")
    got = similarity.ivf_topk_indexed(spark, path, q, k=3, nprobe=3)
    rows = sorted(got.collect(), key=lambda r: r["rank"])
    assert len(rows) == 3 and all(r["query_id"] == 0 for r in rows)
    # nprobe == k scans every cell, so this equals exact cosine top-k
    exact = similarity.cosine_topk(emb, q, k=3)
    assert [r["neighbor_id"] for r in rows] == [
        r["neighbor_id"] for r in sorted(exact.collect(), key=lambda r: r["rank"])
    ]
