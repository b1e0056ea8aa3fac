"""File source/sink round-trips: schema-explicit reads, corrupt-record
capture, partitioned writes with pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.sources.files import read_table, write_table

SCHEMA = "k string, n long, d string"


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("a", 1, "2024-01-01"), ("b", 2, "2024-01-01"), ("c", 3, "2024-01-02")],
        SCHEMA,
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, tmp_path, df, fmt):
    path = str(tmp_path / fmt)
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=SCHEMA if fmt in ("csv", "json") else None)
    assert {tuple(r) for r in back.select("k", "n", "d").collect()} == {
        ("a", 1, "2024-01-01"),
        ("b", 2, "2024-01-01"),
        ("c", 3, "2024-01-02"),
    }


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), fmt="csv")


def test_corrupt_json_rows_are_captured_not_fatal(spark, tmp_path):
    src = tmp_path / "j"
    src.mkdir()
    (src / "a.json").write_text('{"k": "ok", "n": 1}\n{not json at all}\n')
    schema = "k string, n long, _corrupt_record string"
    got = read_table(spark, str(src), fmt="json", schema=schema)
    rows = got.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_partitioned_write_prunes(spark, tmp_path, df):
    path = str(tmp_path / "part")
    write_table(df, path, fmt="parquet", partition_by=["d"])
    assert (tmp_path / "part" / "d=2024-01-01").is_dir()
    back = read_table(spark, path).where(F.col("d") == "2024-01-02")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 1
    # static partition pruning: the non-matching partition never enters the scan
    assert "PartitionFilters: [isnotnull(d" in plan or "d#" in plan


def test_text_gates_are_stream_safe(spark, tmp_path):
    """The curation gate expressions (quality, lang, PII scrub, token count)
    are stateless narrow maps, so the SAME columns must run unchanged in a
    Structured Streaming plan and agree row-for-row with the batch twin —
    the property that lets a 100 TB backfill and its streaming ingest share
    one implementation."""
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from oltp_to_data_warehouse_pipeline_spark.functions import text

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(100)
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    def gates(df):
        toks = F.col("__toks")
        return (
            df.withColumn("__toks", text.tokens("text"))
            .select(
                "doc_id",
                text.quality_score_t("text", toks).alias("quality"),
                text.lang_guess_t(toks).alias("lang_guess"),
                F.size(toks).alias("n_tokens"),
                F.md5(text.pii_scrub("text")).alias("scrubbed_fp"),
            )
        )

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        gates(stream)
        .writeStream.format("memory")
        .queryName("text_gates_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.table("text_gates_sink").collect()}
    batch = {tuple(r) for r in gates(spark.read.parquet(src)).collect()}
    assert streamed == batch and len(batch) == 100


def test_compact_table_merges_small_files(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.sources.files import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(path)  # 32 tiny files
    before_rows = spark.read.parquet(path).count()
    n_before, n_after = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert n_before == 32 and n_after < n_before
    back = spark.read.parquet(path)
    assert back.count() == before_rows
    assert back.select(F.input_file_name()).distinct().count() == n_after
    assert not (tmp_path / "frag__compact_tmp").exists()


def test_compact_table_noop_when_already_compact(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.sources.files import compact_table

    path = str(tmp_path / "ok")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    n_before, n_after = compact_table(spark, path, target_file_bytes=128 * 1024 * 1024)
    assert n_before == n_after == 1


def test_write_sorted_gives_disjoint_file_ranges(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.sources.files import write_sorted

    path = str(tmp_path / "sorted")
    df = spark.range(0, 10_000).withColumn("k", (F.col("id") * 2654435761 % 10_000).cast("long"))
    write_sorted(df, path, sort_cols=["k"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    # each file's key range must be disjoint (that's what makes min/max
    # row-group stats selective for scan-time pruning)
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(ranges) == 4
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_zorder_key_interleaves_disjoint_bits(spark):
    from oltp_to_data_warehouse_pipeline_spark.sources.files import zorder_key

    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key(["x", "y"], mins=[0, 0], maxs=[3, 3], bits=2)
        ).collect()
    }
    # 2-bit quantization of a 0..3 domain is the identity; interleaved bits:
    # x at even positions, y at odd → (3,0)=0b0101, (0,3)=0b1010, (3,3)=0b1111
    assert got == {(0, 0): 0, (3, 0): 5, (0, 3): 10, (3, 3): 15}


def test_write_zordered_skips_on_both_dimensions(spark, tmp_path):
    from oltp_to_data_warehouse_pipeline_spark.sources.files import (
        write_sorted,
        write_zordered,
    )

    n, files = 16_384, 16
    # two independent uniform dimensions (decorrelated by multiplicative hashing)
    df = (
        spark.range(0, n)
        .withColumn("x", (F.col("id") * 2654435761 % n).cast("long"))
        .withColumn("y", (F.col("id") * 40503 % n).cast("long"))
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, ["x", "y"], num_files=files)
    write_sorted(df, spath, sort_cols=["x"], num_files=files)

    def mean_span(path, col):
        rows = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg(((F.max(col) - F.min(col)) / float(n)).alias("frac"))
            .collect()
        )
        return sum(r["frac"] for r in rows) / len(rows)

    # lossless
    assert spark.read.parquet(zpath).count() == n
    # sorted-by-x: x is selective but y spans ~the whole domain in every file
    assert mean_span(spath, "x") < 0.15
    assert mean_span(spath, "y") > 0.85
    # z-ordered: BOTH dimensions' per-file spans shrink well below full domain
    assert mean_span(zpath, "x") < 0.55
    assert mean_span(zpath, "y") < 0.55


def test_zorder_key_bijective_on_grid(spark):
    """Property: with b bits per dimension, the Morton key is a BIJECTION
    on the full 2^b × 2^b quantized grid — no two cells collide and the
    key space is exactly covered.  Collisions would merge far-apart rows
    into one sort position and silently weaken skipping."""
    from oltp_to_data_warehouse_pipeline_spark.sources.files import zorder_key

    bits = 4
    side = 1 << bits
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    keys = grid.withColumn(
        "z", zorder_key(["x", "y"], mins=[0, 0], maxs=[side - 1, side - 1], bits=bits)
    )
    stats = keys.agg(
        F.count_distinct("z").alias("n"),
        F.min("z").alias("lo"),
        F.max("z").alias("hi"),
    ).first()
    assert stats["n"] == side * side
    assert stats["lo"] == 0 and stats["hi"] == side * side - 1


def test_zorder_key_nulls_quantize_to_bucket_zero(spark):
    """NULL cluster values must land in bucket 0 explicitly — not ride
    least/greatest NULL-skipping into the TOP bucket next to max-value rows
    (round-2 advisor finding: that placement silently inflates the last
    file's min/max span on every other dimension)."""
    from oltp_to_data_warehouse_pipeline_spark.sources.files import zorder_key

    df = spark.createDataFrame(
        [(None, 0), (0, 0), (3, 0)], "x int, y int"
    ).withColumn("z", zorder_key(["x", "y"], mins=[0, 0], maxs=[3, 3], bits=2))
    by_x = {r["x"]: r["z"] for r in df.collect()}
    assert by_x[None] == by_x[0]          # NULL co-locates with the LOW end
    assert by_x[None] != by_x[3]          # ... not with the max bucket
