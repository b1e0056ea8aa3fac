"""Quality-check operators (`quality_checks.py` surface, B8 fixed)."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.operators import quality


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 6.0)], ["id", "s", "x"]
    )


def test_null_profile(spark):
    row = quality.null_profile(_df(spark)).first()
    assert row["id_nulls"] == 0 and row["s_nulls"] == 1 and row["x_nulls"] == 1


def test_distinct_profile(spark):
    row = quality.distinct_profile(_df(spark), ["id", "s"]).first()
    assert row["total_rows"] == 3
    assert row["unique_id"] == 2
    assert row["unique_s"] == 2  # countDistinct ignores NULL


def test_summary_stats(spark):
    row = quality.summary_stats(_df(spark), "x").first()
    assert row["n"] == 2 and row["mean"] == 5.5 and row["min"] == 5.0 and row["max"] == 6.0


def test_quality_gate(spark):
    res = quality.quality_gate(_df(spark), key_cols=["id"], not_null_cols=["s"])
    assert res == {"non_empty": True, "unique_id": False, "no_nulls_s": False}
    ok = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"])
    res2 = quality.quality_gate(ok, ["id"], ["s"])
    assert all(res2.values())


def test_fk_orphans(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators.quality import fk_orphans

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "orphan"), (None, "null-fk")],
        "fk: long, payload: string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: long")
    rows = fk_orphans(child, parent, "fk", "pk").collect()
    # NULL fk excluded (SQL semantics); only the true orphan remains
    assert [(r["fk"], r["payload"]) for r in rows] == [(9, "orphan")]


def test_observed_metrics_ride_the_write(spark, tmp_path):
    """Observation metrics must reflect the rows the action processed,
    with no second scan of the input."""
    from oltp_to_data_warehouse_pipeline_spark.operators.quality import observed

    df = spark.createDataFrame(
        [(1, None, 2.0), (2, "b", 3.0), (3, "c", None)], "k: long, s: string, v: double"
    )
    out, obs = observed(df, "load_qc", not_null_cols=["s", "v"], sum_cols=["k"])
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))
    got = obs.get
    assert got["rows"] == 3
    assert got["s_nulls"] == 1 and got["v_nulls"] == 1
    assert got["k_sum"] == 6


def test_table_diff_classification_and_null_safety(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators.diff import table_diff

    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0),        # identical -> absent from diff
         (2, "b", None),        # NULL == NULL -> identical
         (3, "c", 31.0),        # changed value
         (5, "e", 50.0)],       # new key
        "k int, s string, v double",
    )
    got = {r["k"]: r["change"] for r in table_diff(left, right, keys=["k"]).collect()}
    assert got == {3: "changed", 4: "removed", 5: "added"}

    # NULL vs value is a change, not "same"
    right2 = spark.createDataFrame([(2, "b", 7.0)], "k int, s string, v double")
    got2 = {r["k"]: r["change"] for r in table_diff(left.where("k=2"), right2, keys=["k"]).collect()}
    assert got2 == {2: "changed"}


def test_table_diff_null_keys_join_null_safely(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators.diff import table_diff

    left = spark.createDataFrame([(None, "same"), (1, "x")], "k int, v string")
    right = spark.createDataFrame([(None, "same"), (1, "y")], "k int, v string")
    got = {r["k"]: r["change"] for r in table_diff(left, right, keys=["k"]).collect()}
    # NULL-keyed identical row is "same" (absent), not a phantom add+remove
    assert got == {1: "changed"}
