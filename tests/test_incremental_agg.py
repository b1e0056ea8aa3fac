"""Incremental rollup maintenance: merge-of-partials == full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
from oltp_to_data_warehouse_pipeline_spark.plans.incremental_agg import (
    RollupSpec,
    read_rollup,
    refresh_rollup,
)

SF_DIR = "/root/testdata/sf0.001"

SPEC = RollupSpec(
    keys=("order_month", "o_orderstatus"),
    sums={"revenue": "o_totalprice"},
    mins={"min_price": "o_totalprice"},
    maxs={"max_price": "o_totalprice"},
)


def _orders(spark):
    return load_table(spark, SF_DIR, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )


def _snapshot(df):
    return {
        (r["order_month"], r["o_orderstatus"]): (
            round(r["revenue"], 2),
            round(r["min_price"], 2),
            round(r["max_price"], 2),
            r["n_rows"],
        )
        for r in df.collect()
    }


def test_incremental_merge_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    o = _orders(spark)
    # three watermark deltas split on the key space
    b1 = o.where(F.col("o_orderkey") % 3 == 0)
    b2 = o.where(F.col("o_orderkey") % 3 == 1)
    b3 = o.where(F.col("o_orderkey") % 3 == 2)
    for i, b in enumerate((b1, b2, b3)):
        refresh_rollup(spark, b, path, SPEC, batch_id=f"b{i}", partition_key="order_month")

    got = _snapshot(read_rollup(spark, path))
    want = _snapshot(SPEC.partial(o))
    assert got == want, "merged rollup diverged from full recompute"


def test_replayed_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "rollup")
    o = _orders(spark)
    refresh_rollup(spark, o, path, SPEC, batch_id="b0", partition_key="order_month")
    before = _snapshot(read_rollup(spark, path))
    # at-least-once delivery: same batch id arrives again -> must not double-count
    refresh_rollup(spark, o, path, SPEC, batch_id="b0", partition_key="order_month")
    assert _snapshot(read_rollup(spark, path)) == before


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    import glob
    import os

    path = str(tmp_path / "rollup")
    o = _orders(spark)
    early = o.where(F.col("order_month") < "1997-01")
    late = o.where(F.col("order_month") >= "1997-01")
    refresh_rollup(spark, early, path, SPEC, batch_id="b0", partition_key="order_month")
    some_early = sorted(glob.glob(f"{path}/order_month=1996*/*.parquet"))
    mtimes = {f: os.path.getmtime(f) for f in some_early}

    refresh_rollup(spark, late, path, SPEC, batch_id="b1", partition_key="order_month")
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t, f"untouched partition file rewritten: {f}"


def test_avg_derived_at_read(spark, tmp_path):
    path = str(tmp_path / "rollup")
    o = _orders(spark)
    refresh_rollup(spark, o, path, SPEC, batch_id="b0", partition_key="order_month")
    got = read_rollup(spark, path, avgs={"avg_price": ("revenue", "n_rows")})
    want = {
        (r["order_month"], r["o_orderstatus"]): round(r["avg_price"], 4)
        for r in o.groupBy("order_month", "o_orderstatus")
        .agg(F.avg("o_totalprice").alias("avg_price"))
        .collect()
    }
    for r in got.collect():
        assert round(r["avg_price"], 4) == want[(r["order_month"], r["o_orderstatus"])]


def test_distinct_sketch_merges_and_matches_exact(spark, tmp_path):
    """HLL sketch columns: union-of-partials == sketch-of-all (estimates
    identical — HLL is deterministic), and at small cardinality the
    estimate equals the exact distinct count."""
    path = str(tmp_path / "rollup_hll")
    spec = RollupSpec(
        keys=("order_month",),
        distinct_sketches={"custs": "o_custkey"},
    )
    o = _orders(spark)
    split = F.col("o_orderkey") % 3
    for i in range(3):
        refresh_rollup(
            spark, o.where(split == i), path, spec,
            batch_id=f"b{i}", partition_key="order_month",
        )
    got = {
        r["order_month"]: r["custs"]
        for r in read_rollup(spark, path, distinct_estimates=["custs"]).collect()
    }
    oracle = {
        r["order_month"]: r["exact"]
        for r in o.groupBy("order_month")
        .agg(F.count_distinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(got) == set(oracle)
    for m, exact in oracle.items():
        # per-month cardinality here is far below HLL's ~lgK=12 error floor
        assert got[m] == exact, (m, got[m], exact)


def test_interrupted_merge_detected_not_double_applied(spark, tmp_path):
    """Journal semantics: a clean-aborted merge retries safely; a merge
    whose data may have landed fails loudly; an uncommitted INITIAL write
    redoes the overwrite instead of double-merging."""
    import os

    import pytest

    from oltp_to_data_warehouse_pipeline_spark.plans.incremental_agg import (
        _mark_begin,
    )

    path = str(tmp_path / "rollup")
    o = _orders(spark)
    refresh_rollup(spark, o, path, SPEC, batch_id="b0", partition_key="order_month")
    baseline = _snapshot(read_rollup(spark, path))

    # clean abort: begin marker exists but file inventory is unchanged
    # (the failed job committed nothing) -> replay retries and succeeds
    delta = o.limit(5)
    _mark_begin(spark, path, "b1", "merge")
    refresh_rollup(spark, delta, path, SPEC, batch_id="b1", partition_key="order_month")
    after_b1 = _snapshot(read_rollup(spark, path))
    assert after_b1 != baseline  # merge landed exactly once

    # possibly-landed: inventory recorded at begin differs from disk now
    with open(os.path.join(path, "_applied_batches", "b2.begin"), "w") as f:
        f.write("merge\nbogus-inventory-from-before-the-crash")
    with pytest.raises(RuntimeError, match="interrupted between merge and commit"):
        refresh_rollup(spark, delta, path, SPEC, batch_id="b2", partition_key="order_month")
    # operator resolves (removes the marker) -> replay proceeds
    os.remove(os.path.join(path, "_applied_batches", "b2.begin"))
    refresh_rollup(spark, delta, path, SPEC, batch_id="b2", partition_key="order_month")


def test_uncommitted_initial_write_replays_as_overwrite(spark, tmp_path):
    """Crash between the FIRST batch's overwrite and its commit marker:
    data is on disk but uncommitted — the replay must redo the idempotent
    overwrite, NOT fall into the merge path and double every sum."""
    import os

    from oltp_to_data_warehouse_pipeline_spark.plans.incremental_agg import (
        _mark_begin,
    )

    path = str(tmp_path / "rollup")
    o = _orders(spark)
    refresh_rollup(spark, o, path, SPEC, batch_id="b0", partition_key="order_month")
    once = _snapshot(read_rollup(spark, path))
    # simulate the crash: commit marker gone, init-phase begin marker present
    os.remove(os.path.join(path, "_applied_batches", "b0"))
    _mark_begin(spark, path, "b0", "init")
    refresh_rollup(spark, o, path, SPEC, batch_id="b0", partition_key="order_month")
    assert _snapshot(read_rollup(spark, path)) == once  # not doubled


def test_route_aggregate_answers_coarser_grain_from_rollup(spark, tmp_path):
    """Aggregate navigation: any grouping over a subset of the rollup keys
    re-merges to exactly the base-table answer (sketches included)."""
    import pytest

    from oltp_to_data_warehouse_pipeline_spark.plans.incremental_agg import (
        route_aggregate,
    )

    path = str(tmp_path / "rollup")
    spec = RollupSpec(
        keys=("order_month", "o_orderstatus"),
        sums={"revenue": "o_totalprice"},
        maxs={"max_price": "o_totalprice"},
        distinct_sketches={"custs": "o_custkey"},
    )
    o = _orders(spark)
    refresh_rollup(spark, o, path, spec, batch_id="b0", partition_key="order_month")

    routed = route_aggregate(
        spark, path, spec, ["o_orderstatus"], distinct_estimates=["custs"]
    )
    got = {
        r["o_orderstatus"]: (round(r["revenue"], 2), r["n_rows"], r["custs"])
        for r in routed.collect()
    }
    want = {
        r["o_orderstatus"]: (
            round(r["revenue"], 2),
            r["n_rows"],
            r["exact_custs"],
        )
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_custkey").alias("exact_custs"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1]
        # HLL estimate vs exact: tiny per-status cardinalities -> exact here
        assert got[k][2] == want[k][2]

    # uncovered grain must refuse, not silently mis-answer
    with pytest.raises(KeyError, match="not covered"):
        route_aggregate(spark, path, spec, ["o_orderpriority"])


def test_null_partition_key_accumulates_across_batches(spark, tmp_path):
    """Round-10 review: the touched-partition prune must be NULL-safe —
    two deltas both touching the NULL partition must ACCUMULATE there
    (isin()/plain equi-semi-join would reset it to the last batch)."""
    path = str(tmp_path / "rollup")
    spec = RollupSpec(keys=("grp",), sums={"total": "x"})
    rows1 = [("a", 1.0), (None, 10.0)]
    rows2 = [("a", 2.0), (None, 20.0)]
    b1 = spark.createDataFrame(rows1, "grp string, x double")
    b2 = spark.createDataFrame(rows2, "grp string, x double")
    refresh_rollup(spark, b1, path, spec, batch_id="b1", partition_key="grp")
    refresh_rollup(spark, b2, path, spec, batch_id="b2", partition_key="grp")
    got = {r["grp"]: (r["total"], r["n_rows"]) for r in read_rollup(spark, path).collect()}
    assert got["a"] == (3.0, 2)
    assert got[None] == (30.0, 2), got
