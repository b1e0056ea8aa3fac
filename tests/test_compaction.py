"""Compaction planner: the bin-pack guarantee (every bin but a partition's
last is at least target-sized), pass-through of oversized files, order
stability, and the Column-target (scale-free) variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import compaction


def _inventory(spark, sizes_by_part):
    rows = [
        (part, i, s)
        for part, sizes in sizes_by_part.items()
        for i, s in enumerate(sizes)
    ]
    return spark.createDataFrame(rows, "part string, file_id int, size_bytes long")


def test_bins_meet_target_except_last(spark):
    inv = _inventory(
        spark, {"a": [40, 70, 10, 100, 5, 60, 90], "b": [10, 10, 10, 10]}
    )
    target = 100
    plan = compaction.plan_bins(inv, ["part"], target_bytes=target)
    summary = compaction.bin_summary(plan, ["part"]).collect()
    last_bin = {
        r["part"]: r["bin"]
        for r in compaction.bin_summary(plan, ["part"])
        .groupBy("part")
        .agg(F.max("bin").alias("bin"))
        .collect()
    }
    for r in summary:
        if r["bin"] != last_bin[r["part"]]:
            assert r["bin_bytes"] >= target, f"{r} under target"


def test_bins_are_contiguous_and_order_preserving(spark):
    """Bin ids within a partition must be non-decreasing in file order and
    start at 0 with no gaps — a rewrite job schedules them positionally."""
    inv = _inventory(spark, {"a": [30, 30, 30, 30, 30, 30, 30]})
    plan = compaction.plan_bins(inv, ["part"], target_bytes=90)
    rows = sorted(plan.collect(), key=lambda r: r["file_id"])
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins)
    assert bins[0] == 0
    assert set(bins) == set(range(max(bins) + 1))


def test_oversized_file_passes_through(spark):
    """A file already past the target must not absorb followers: the file
    after it opens a fresh bin immediately."""
    inv = _inventory(spark, {"a": [500, 10, 10]})
    plan = {r["file_id"]: r["bin"] for r in compaction.plan_bins(
        inv, ["part"], target_bytes=100
    ).collect()}
    assert plan[0] == 0
    assert plan[1] != plan[0]
    assert plan[2] == plan[1]  # the two small files pack together


def test_total_bytes_conserved(spark):
    inv = _inventory(spark, {"a": [40, 70, 10, 100, 5], "b": [1, 2, 3]})
    plan = compaction.plan_bins(inv, ["part"], target_bytes=64)
    total_in = inv.agg(F.sum("size_bytes")).collect()[0][0]
    total_out = (
        compaction.bin_summary(plan, ["part"]).agg(F.sum("bin_bytes")).collect()[0][0]
    )
    assert total_in == total_out


def test_column_target_matches_int_target(spark):
    """A per-partition Column target equal to a constant must plan exactly
    like the int form — the scale-free variant is the same operator."""
    inv = _inventory(spark, {"a": [40, 70, 10, 100, 5, 60], "b": [10, 20, 30]})
    by_int = compaction.plan_bins(inv, ["part"], target_bytes=64)
    by_col = compaction.plan_bins(
        inv.withColumn("__t", F.lit(64)), ["part"], target_bytes=F.col("__t")
    ).drop("__t")
    key = lambda r: (r["part"], r["file_id"])  # noqa: E731
    assert sorted(map(tuple, by_int.collect()), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, by_col.select(*by_int.columns).collect()),
        key=lambda t: (t[0], t[1]),
    )


def test_real_inventory_plan_and_rewrite(spark, tmp_path):
    """The plan→rewrite loop on a REAL partitioned table: inventory comes
    from the scan's _metadata file index, the plan assigns bins, and the
    per-partition rewrite leaves exactly one file per bin with identical
    data — other partitions untouched."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(p, i, f"v{i}") for p in ("a", "b") for i in range(40)],
        "pt string, k int, v string",
    )
    # 8 small files per partition
    df.repartition(8).write.partitionBy("pt").parquet(path)
    inv = compaction.inventory(spark.read.parquet(path), ["pt"])
    per_file = inv.agg(F.min("size_bytes"), F.max("size_bytes")).first()
    target = int(per_file[1]) * 3  # ~3 files per bin
    plan = compaction.plan_bins(inv, ["pt"], target_bytes=target)
    a_rows = [r.asDict() for r in plan.where(F.col("pt") == "a").collect()]
    n_bins = len({r["bin"] for r in a_rows})
    assert 1 < n_bins < 8
    before = sorted(
        (r["pt"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    out = compaction.compact_partition_by_plan(spark, f"{path}/pt=a", a_rows)
    assert out == n_bins
    after_inv = compaction.inventory(spark.read.parquet(path), ["pt"])
    counts = {r["pt"]: r["n"] for r in after_inv.groupBy("pt").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts["pt=a" if "pt=a" in counts else "a"] == n_bins
    assert counts["pt=b" if "pt=b" in counts else "b"] == 8  # untouched
    after = sorted(
        (r["pt"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert after == before
