"""Poisson-bootstrap CI: statistical sanity (bracketing, width vs the
analytic standard error), exact full-sample mean, weight marginals, and
determinism.  The cross-engine value equality is oracle-gated by the
`order_value_bootstrap_ci` registry entry; these tests cover the
statistics the hash gate cannot see — a degenerate near-copy resampling
scheme was strict-GREEN while producing a CI that missed the mean
(round-6 lesson: differential parity proves two engines agree, not that
either is right)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
from oltp_to_data_warehouse_pipeline_spark.operators.stats import (
    bootstrap_mean_ci,
    poisson_weight,
)

SF = "/root/testdata/sf0.01"


def test_ci_brackets_mean_with_plausible_width(spark):
    o = load_table(spark, SF, "orders")
    r = bootstrap_mean_ci(o, "o_orderkey", "o_totalprice", replicas=100).collect()[0]
    assert r["ci_lo"] < r["mean_value"] < r["ci_hi"]
    stats = o.agg(
        F.stddev("o_totalprice").alias("sd"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    se = stats["sd"] / stats["n"] ** 0.5
    width = r["ci_hi"] - r["ci_lo"]
    # 95% percentile CI width ≈ 2·1.96·se; accept a wide band (B=100)
    assert 2.0 * se < width < 8.0 * se, (width, se)


def test_full_sample_lane_is_exact_mean(spark):
    o = load_table(spark, SF, "orders")
    r = bootstrap_mean_ci(o, "o_orderkey", "o_totalprice", replicas=20).collect()[0]
    exact = o.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    ).collect()[0]["m"]
    assert r["n_rows"] == o.count()
    assert abs(r["mean_value"] - round(exact, 4)) < 1e-9


def test_weights_have_poisson1_marginals(spark):
    """Mean weight ≈ 1 and P(w=0) ≈ e⁻¹ per replica — the property that
    makes each replica a valid resample (the broken common-stride scheme
    had correct marginals too, but ACROSS replicas they were near-copies;
    the cross-replica variance is covered by the width test above)."""
    from oltp_to_data_warehouse_pipeline_spark.util import md5_fold48

    o = load_table(spark, SF, "orders")
    h = (md5_fold48(F.col("o_orderkey"), "bs|") % 2147483647).alias("h")
    e = o.select(h).select(
        "h", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("r")
    )
    w = poisson_weight(F.col("h"), F.col("r"))
    agg = e.select(w.alias("w")).agg(
        F.avg("w").alias("mw"), F.avg((F.col("w") == 0).cast("int")).alias("p0")
    ).collect()[0]
    assert abs(agg["mw"] - 1.0) < 0.02
    assert abs(agg["p0"] - 0.36788) < 0.02


def test_deterministic_across_invocations(spark):
    o = load_table(spark, SF, "orders")
    a = bootstrap_mean_ci(o, "o_orderkey", "o_totalprice", replicas=50).collect()[0]
    b = bootstrap_mean_ci(o, "o_orderkey", "o_totalprice", replicas=50).collect()[0]
    assert a == b


def test_tiny_n_zero_weight_replicas_are_dropped(spark):
    """n=1: many replicas draw weight 0 for the single row → NULL means.
    Spark ranks NULLs FIRST on ASC windows while DuckDB defaults to
    NULLS LAST, so unless those replicas are dropped the CI rank picks
    diverge cross-engine (advisor r6 finding).  With the nw>0 filter the
    surviving replica means all equal the single value, so both bounds
    must equal the mean — non-NULL, well-defined."""
    one = spark.createDataFrame([(1, 4200.0)], "k int, v double")
    r = bootstrap_mean_ci(one, "k", "v", replicas=100).collect()[0]
    assert r["n_rows"] == 1
    assert r["mean_value"] == 4200.0
    assert r["ci_lo"] == 4200.0 and r["ci_hi"] == 4200.0
