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


# ---------------------------------------------------------------------------
# Property tests (VERDICT r7 item 8): random write/delete/tombstone churn →
# the plan's PROVABLE invariants hold (see plan_bins docstring), the
# plan→rewrite loop converges in one pass, and no row is lost.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_inventories = st.dictionaries(
    st.sampled_from(["p0", "p1", "p2"]),
    st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=24),
    min_size=1,
    max_size=3,
)


@settings(max_examples=12, deadline=None)
@given(sizes_by_part=_inventories, target=st.integers(min_value=1, max_value=250))
def test_plan_invariants_hold_under_random_inventories(
    spark, sizes_by_part, target
):
    """For ANY inventory (random churn leaves an arbitrary size sequence):
    (a) every file lands in exactly one bin — nothing lost or duplicated;
    (b) bins are non-decreasing in file order; (c) per-partition output
    file count ≤ total div target + 1; (d) every bin < target + its own
    largest file; (e) re-planning the rewritten bins is a fixpoint (each
    output file its own bin) — compaction never churns."""
    inv = _inventory(spark, sizes_by_part)
    plan = compaction.plan_bins(inv, ["part"], target_bytes=target)
    rows = plan.collect()
    # (a) conservation: same (part, file_id, size) multiset, bin non-null
    got = sorted((r["part"], r["file_id"], r["size_bytes"]) for r in rows)
    want = sorted(
        (p, i, s) for p, ss in sizes_by_part.items() for i, s in enumerate(ss)
    )
    assert got == want
    assert all(r["bin"] is not None and r["bin"] >= 0 for r in rows)
    by_part: dict = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    for part, prows in by_part.items():
        prows.sort(key=lambda r: r["file_id"])
        bins = [r["bin"] for r in prows]
        # (b) order-preserving
        assert bins == sorted(bins), (part, bins)
        total = sum(r["size_bytes"] for r in prows)
        n_bins = len(set(bins))
        # (c) the count bound that kills the small-files problem
        assert n_bins <= total // target + 1, (part, n_bins, total, target)
        # (d) bounded overshoot: bin < target + its largest member
        agg: dict = {}
        for r in prows:
            agg.setdefault(r["bin"], []).append(r["size_bytes"])
        for b, ss in agg.items():
            assert sum(ss) < target + max(ss), (part, b, ss, target)
        # (e) one-pass fixpoint: rewritten files (one per bin, in bin
        # order) re-plan to one bin each
        rewritten = [sum(agg[b]) for b in sorted(agg)]
        re_inv = _inventory(spark, {part: rewritten})
        re_plan = compaction.plan_bins(re_inv, ["part"], target_bytes=target)
        re_bins = [r["bin"] for r in re_plan.collect()]
        assert len(set(re_bins)) == len(rewritten), (part, rewritten, re_bins)


def test_rewrite_after_tombstone_churn_loses_no_row(spark, tmp_path):
    """E2E churn: randomized (seeded) write/overwrite/delete sequence on a
    partitioned table — delete via tombstone filter-and-rewrite of single
    files — then plan+compact each partition; the surviving row multiset
    is identical and the output file count meets the plan."""
    import random

    rng = random.Random(8)
    path = str(tmp_path / "tbl")
    # initial load: many small files across two partitions
    for batch in range(6):
        spark.createDataFrame(
            [
                (rng.choice(["a", "b"]), batch * 100 + i, rng.randint(0, 9))
                for i in range(rng.randint(5, 30))
            ],
            "pt string, k int, v int",
        ).coalesce(1).write.mode("append").partitionBy("pt").parquet(path)
    # tombstone churn: drop a random v-value by rewriting one random file
    # (filter-and-rewrite, the parquet-level delete) — twice
    for _ in range(2):
        inv = compaction.inventory(spark.read.parquet(path), ["pt"]).collect()
        victim = rng.choice(inv)
        dead_v = rng.randint(0, 9)
        kept = spark.read.parquet(victim["file_id"]).where(F.col("v") != dead_v)
        kept_rows = kept.collect()
        spark.createDataFrame(
            kept_rows or [], "k int, v int"
        ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
        import shutil
        import glob as _glob
        import os

        local = victim["file_id"].replace("file:", "")
        os.remove(local)
        # Hadoop's LocalFS keeps a .<name>.crc sidecar; swapping the file
        # content under the same name with the old sidecar present fails
        # the read with ChecksumException — a real tombstone writer goes
        # through the FileSystem API, which rewrites it
        crc = os.path.join(os.path.dirname(local), "." + os.path.basename(local) + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
        src = _glob.glob(str(tmp_path / "one" / "part-*.parquet"))
        if kept_rows and src:
            shutil.copy(src[0], local)
    before = sorted(
        (r["pt"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    inv = compaction.inventory(spark.read.parquet(path), ["pt"])
    stats = inv.groupBy("pt").agg(
        F.sum("size_bytes").alias("tot"), F.max("size_bytes").alias("mx")
    ).collect()
    target = max(int(min(r["mx"] for r in stats)) * 2, 1)
    plan = compaction.plan_bins(inv, ["pt"], target_bytes=target)
    for part in ("pt=a", "pt=b"):
        prows = [
            r.asDict()
            for r in plan.where(F.col("pt") == part).collect()
        ]
        if not prows:
            continue
        n = compaction.compact_partition_by_plan(spark, f"{path}/{part}", prows)
        assert n == len({r["bin"] for r in prows})
    after = sorted(
        (r["pt"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert after == before


# --- sequence packing (sample packing over the same grid) -------------------


def _pack_fixture(spark, sizes, strata="en"):
    rows = [(i, strata, int(n)) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")


def test_sequence_pack_deterministic_and_bounded(spark):
    docs = _pack_fixture(spark, [100, 300, 512, 7, 250, 90, 400, 33])
    a = {r["doc_id"]: (r["block"], r["seq"], r["seq_offset"])
         for r in compaction.sequence_pack(docs, ["lang"], capacity=512).collect()}
    b = {r["doc_id"]: (r["block"], r["seq"], r["seq_offset"])
         for r in compaction.sequence_pack(docs, ["lang"], capacity=512).collect()}
    assert a == b and len(a) == 8
    for blk, _, off in a.values():
        assert 0 <= blk < 16
        assert 0 <= off < 512


def test_sequence_pack_respects_block_count(spark):
    docs = _pack_fixture(spark, [10] * 200)
    plan = compaction.sequence_pack(docs, ["lang"], capacity=64, blocks=4)
    blocks = {r["block"] for r in plan.select("block").distinct().collect()}
    assert blocks <= set(range(4)) and len(blocks) > 1


def test_sequence_pack_count_bound_and_contiguity(spark):
    """With every doc <= capacity the grid can never skip a cell, so seq
    ids are contiguous per (stratum, block) and the plan_bins count bound
    holds: n_seqs <= total div capacity + 1."""
    docs = _pack_fixture(spark, [1 + (i * 37) % 512 for i in range(300)])
    plan = compaction.sequence_pack(docs, ["lang"], capacity=512).collect()
    per_block: dict = {}
    for r in plan:
        per_block.setdefault(r["block"], []).append(r)
    for blk, rows in per_block.items():
        seqs = sorted({r["seq"] for r in rows})
        assert seqs == list(range(len(seqs))), f"block {blk} skipped a seq"
        total = sum(r["n_tokens"] for r in rows)
        assert len(seqs) <= total // 512 + 1


def test_sequence_pack_strata_are_independent(spark):
    en = _pack_fixture(spark, [100, 200, 300], strata="en")
    de = _pack_fixture(spark, [100, 200, 300], strata="de")
    both = compaction.sequence_pack(en.unionByName(de), ["lang"], capacity=256)
    only_en = compaction.sequence_pack(en, ["lang"], capacity=256)
    got_en = {r["doc_id"]: (r["block"], r["seq"], r["seq_offset"])
              for r in both.where(F.col("lang") == "en").collect()}
    want_en = {r["doc_id"]: (r["block"], r["seq"], r["seq_offset"])
               for r in only_en.collect()}
    assert got_en == want_en
