"""Small-file compaction planner — metadata-sized bin packing for the
100 TB small-files problem.

A streaming/CDC sink (sources/upsert.py, streaming/cdc.py) that commits
every micro-batch leaves each table partition littered with files far
below the scan-efficient size (~128 MB-1 GB): at 100 TB a few million
undersized files mean a few million scheduler tasks, dominated by open
overhead rather than bytes.  Table formats solve this with periodic
compaction (Iceberg's ``rewrite_data_files`` bin-packing strategy, Delta
OPTIMIZE); the PLANNING half is a pure relational computation over the
file inventory and belongs in the engine:

1. inventory: one row per (partition…, file_id, size_bytes) — metadata,
   a few million rows at 100 TB, never the data itself;
2. deterministic order WITHIN each partition (file_id — commit order in a
   real manifest), then a running size of all PRECEDING files;
3. ``bin = preceding_bytes div target_bytes`` — grid packing: a file
   joins the bin of the target-multiple its preceding bytes fall in.
   Provable guarantees (property-tested in tests/test_compaction.py):
   (a) output file count ≤ ``total_bytes div target + 1`` per partition,
   so the mean output file is ≥ ~target-sized; (b) every bin is smaller
   than ``target + its largest file`` (oversized inputs pass through
   rather than blocking packing); (c) bins are order-preserving within
   the partition; (d) ONE rewrite reaches the fixpoint — re-planning the
   rewritten files assigns every file its own bin, so repeated compaction
   never churns.  NOT guaranteed: "every non-last bin ≥ target" — a file
   that overshoots several grid cells leaves its successor mid-grid and
   the next bin can be undersized (e.g. sizes 150,230,40,70 at target
   100 → bins 0,1,3,4 with bins 3,4 under target).  The count bound (a)
   is the one that matters for the small-files problem: the scheduler
   cost is file count, and trading occasional undersized bins for a
   one-window, embarrassingly-parallel, SQL-replayable plan is the
   point (a true running-reset packer is inherently sequential per
   partition).

Why cumulative-sum packing and not first-fit-DECREASING: FFD's
sort-by-size-then-scan is inherently sequential per partition and its
placement depends on every earlier decision, which makes the plan
non-replayable from a predicate; the cumulative form is ONE window
expression — embarrassingly parallel across partitions, deterministic,
and auditable in SQL (the differential oracle replays it verbatim).

The execution half already exists: ``sources/files.compact_table``
rewrites a table to ceil(bytes/target) files.  This planner is its
partition-aware, bin-granular front end — at 100 TB you compact the few
partitions whose plan shows n_files ≫ 1 per bin instead of rewriting the
table, and the plan relation itself is oracle-checkable
(``orders_compaction_plan``).

Reference anchor: the reference pipeline's warehouse loader rewrites whole
tables per run (spark_etl.py:160-166), which sidesteps compaction at toy
scale but is exactly the full-rewrite cost this planner amortizes at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def plan_bins(
    files: DataFrame,
    partition_cols: list[str],
    file_col: str = "file_id",
    size_col: str = "size_bytes",
    target_bytes: int | Column = 128 * 1024 * 1024,
    offset_col: str | None = None,
) -> DataFrame:
    """Assign every inventory row a ``bin`` within its partition.

    Input: one row per file with ``partition_cols``, ``file_col`` (the
    deterministic within-partition order — commit sequence in a real
    manifest) and ``size_col``.  ``target_bytes`` is an int, or a Column
    already joined onto the inventory (e.g. a per-partition fraction of the
    total, which keeps the plan scale-free).  Output: the input columns
    plus ``bin`` (bigint, 0-based).  The window is ordered rows-between so
    the running sum is positionally exact (no range-frame ties), and it
    EXCLUDES the current row: a file opens a new bin when the files before
    it already reached the target, so every bin except a partition's last
    holds at least the target.  The quotient is BIGINT ``div`` — exact at
    any byte magnitude (a double divide quietly loses precision past 2^53,
    which real cumulative byte counts can reach).

    Non-positive targets are guarded HERE, not by callers: an int target
    ≤ 0 raises, and a Column target is clamped to ≥ 1 — BIGINT ``div`` by
    0 is NULL under non-ANSI semantics, which would silently emit NULL
    bins that :func:`bin_summary` groups into one bogus bin.

    ``offset_col``: optionally also emit ``preceding mod target`` — the
    row's write offset within its bin's grid cell (:func:`sequence_pack`
    feeds training-sequence writers with it).
    """
    if isinstance(target_bytes, int) and target_bytes <= 0:
        raise ValueError(
            f"plan_bins: target_bytes must be positive, got {target_bytes}"
        )
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tcol = (
        F.greatest(target_bytes.cast("bigint"), F.lit(1).cast("bigint"))
        if isinstance(target_bytes, Column)
        else F.lit(target_bytes)
    )
    preceding = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("bigint")
    out = (
        files.withColumn("__preceding", preceding)
        .withColumn("__bin_target", tcol.cast("bigint"))
        .withColumn("bin", F.expr("__preceding div __bin_target"))
    )
    if offset_col is not None:
        # preceding mod target = the write offset within the bin's grid
        # cell (sequence packing needs it) — emitted here instead of
        # recomputing the window downstream
        out = out.withColumn(offset_col, F.expr("__preceding % __bin_target"))
    return out.drop("__preceding", "__bin_target")


def bin_summary(
    plan: DataFrame,
    partition_cols: list[str],
    size_col: str = "size_bytes",
) -> DataFrame:
    """Roll the per-file plan up to one row per output bin: file count and
    total bytes — what the rewrite job schedules from, and what an operator
    reviews before running it (n_files ≫ 1 per bin ⇒ compaction is worth
    the write amplification)."""
    return plan.groupBy(*partition_cols, "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(size_col).cast("bigint").alias("bin_bytes"),
    )


def sequence_pack(
    docs: DataFrame,
    strata_cols: list[str],
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    blocks: int = 16,
) -> DataFrame:
    """Sample packing: assign documents to fixed-``capacity`` training
    sequences — the step between curation and the data loader (every
    pretraining pipeline packs shuffled documents into max-seq-length
    rows; padding thrown away at this step is paid in FLOPs forever).

    Same grid packing as :func:`plan_bins` (literally calls it), with two
    choices specific to training data:

    - **Shuffle order, not arrival order**: documents pack in
      ``md5(id)`` order — a deterministic stand-in for the loader's
      shuffle, so the plan is reproducible and SQL-replayable while still
      decorrelating neighbors (packing sorted-by-source docs would put
      near-identical documents in the same context window).
    - **Two-level for scale**: the first hex digit of the same md5 splits
      every stratum into ``blocks`` independent packing units, so no
      window ever sees a data-sized partition — the 100 TB form sizes
      ``blocks`` so a (stratum, block) fits one task, unlike a flat
      per-stratum window whose biggest stratum lands on one reducer.
      Sequences never cross blocks; the cost is at most one underfilled
      tail sequence per (stratum, block), bounded by
      ``strata × blocks × capacity`` wasted tokens corpus-wide.

    Output: input columns + ``block`` (int), ``seq`` (bigint, 0-based
    within (strata…, block)), ``seq_offset`` (bigint — the document's
    first-token position in its grid cell).  Grid semantics inherited
    from plan_bins — state them precisely, because the writer contract
    depends on them: a sequence's LAST document may straddle the capacity
    boundary (any doc whose ``seq_offset + tokens > capacity``, not only
    docs longer than capacity), so sequences are
    ``capacity + (last doc's overhang)`` long and the writer either pads
    the next sequence's start or splits the straddler — this planner
    never splits (pair with chunking upstream when hard-capacity rows are
    required).  A multi-cell overshoot leaves holes in the ``seq``
    numbering (no documents land there; renumber densely downstream if
    the loader needs contiguous ids)."""
    mh = F.md5(F.col(id_col).cast("string"))
    ordered = docs.withColumn(
        # 8 hex digits = 32 bits, exact in BIGINT, then mod blocks —
        # engine-portable (the oracle refolds the same digits)
        "block",
        F.pmod(
            F.conv(F.substring(mh, 1, 8), 16, 10).cast("bigint"), F.lit(blocks)
        ).cast("int"),
    ).withColumn(
        # md5 is fixed-width hex, so concatenation with a zero-padded id
        # keeps lexicographic order = (md5, numeric id) — one sort key
        # column for plan_bins with a deterministic tie-break
        "__ord", F.concat(mh, F.lpad(F.col(id_col).cast("string"), 20, "0"))
    )
    return (
        plan_bins(
            ordered,
            [*strata_cols, "block"],
            file_col="__ord",
            size_col=tokens_col,
            target_bytes=capacity,
            offset_col="seq_offset",
        )
        .withColumnRenamed("bin", "seq")
        .drop("__ord")
    )


def inventory(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """REAL file inventory from the scan's own file index: one row per
    (partition…, file_id, size_bytes) via the hidden ``_metadata`` struct —
    no data columns projected, no driver-side filesystem walk, identical on
    local/HDFS/S3 (the same mechanism as ``sources/files.compact_table``).
    ``file_id`` is the file path: lexicographic order ≈ commit order for
    every writer in this repo (part-NNNNN naming), giving :func:`plan_bins`
    its deterministic within-partition order."""
    return df.select(
        *partition_cols,
        F.col("_metadata.file_path").alias("file_id"),
        F.col("_metadata.file_size").alias("size_bytes"),
    ).distinct()


def compact_partition_by_plan(
    spark,
    part_dir: str,
    plan_rows: list,
    fmt: str = "parquet",
) -> int:
    """Execute one partition's bin plan: each bin's files rewrite to ONE
    file.  ``plan_rows`` is the partition's slice of :func:`plan_bins`
    output collected to the driver — file metadata, a few rows per
    partition by construction.  Rewrite goes through a temp directory and
    a rename swap (never half-deletes, like ``compact_table``).  Returns
    the number of output files (= bins).

    The per-bin loop issues one small Spark job per bin, sequentially —
    right for the few-bins-per-partition case this targets; a fleet-scale
    compactor would submit partitions concurrently (each call touches only
    its own directory, so calls are independent)."""
    from collections import defaultdict

    from oltp_to_data_warehouse_pipeline_spark import fs

    bins: dict[int, list[str]] = defaultdict(list)
    for r in plan_rows:
        bins[int(r["bin"])].append(r["file_id"])
    tmp = part_dir.rstrip("/") + "__compact_tmp"
    fs.delete(spark, tmp)
    for b in sorted(bins):
        (
            spark.read.format(fmt)
            .load(bins[b])
            .coalesce(1)
            .write.format(fmt)
            .mode("append")
            .save(tmp)
        )
    trash = part_dir.rstrip("/") + "__compact_old"
    fs.delete(spark, trash)
    if not fs.rename(spark, part_dir, trash):
        fs.delete(spark, tmp)
        raise IOError(f"compact: could not stage {part_dir} aside")
    if not fs.rename(spark, tmp, part_dir):
        fs.rename(spark, trash, part_dir)  # roll back — table intact
        fs.delete(spark, tmp)  # don't orphan the compacted copy
        raise IOError(f"compact: could not publish {tmp}; rolled back")
    fs.delete(spark, trash)
    return len(bins)
