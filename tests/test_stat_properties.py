"""Statistics-level validity of the analytical monitors — properties the
cross-engine hash gate cannot see.

The round-6 bootstrap lesson: differential parity proves two engines
AGREE, not that either is RIGHT — a strict-GREEN resampling scheme was
statistically broken until tests asserted the statistics themselves.
This module applies the same discipline to the other statistical
operators (round-6 verdict item 3): PSI ≈ 0 on identical distributions
and large under planted drift; MAD fences survive contamination that
breaks the classical z-fence; Gini hits exact known-distribution values;
the Zipf fit recovers a planted power law.

Each test synthesizes its own table (written as ``events.parquet`` /
``documents.parquet`` in a tmpdir) and calls the REGISTERED query
function on it — the same code path the oracle gate runs, pointed at a
distribution whose statistics are known analytically.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.plans.queryset import (
    corpus_zipf_slope,
    event_value_outliers_mad,
    event_value_psi_drift,
    user_activity_gini,
)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_epoch_sec, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, float(t), u, et, float(v), "{}") for (i, t, u, et, v) in rows],
        "event_id bigint, ts_e double, user_id bigint, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("ts_e").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


# ---------------------------------------------------------------- PSI ----


def test_psi_near_zero_on_identical_distributions(spark, tmp_path):
    """Identical value multisets in the reference (first half of the time
    range) and current (second half) windows → every bin has equal counts
    and Laplace-smoothed proportions → PSI must be exactly 0 after
    rounding.  A PSI that is not ~0 under the null is an alarm that cries
    wolf — the one property that makes the monitor usable."""
    rows = []
    eid = 0
    for half, t0 in ((0, 0), (1, 10_000)):
        for i in range(500):
            rows.append((eid, t0 + i, 1, "stable", i % 10))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    r = {x["event_type"]: x for x in event_value_psi_drift(spark, d).collect()}
    assert r["stable"]["n_ref"] == r["stable"]["n_cur"] == 500
    assert abs(r["stable"]["psi"]) <= 1e-9


def test_psi_flags_planted_drift(spark, tmp_path):
    """A hard shift (all mass moves to disjoint bins between windows) must
    clear the standard 'investigate' threshold (PSI > 0.25) by a wide
    margin — with 10 bins fully swapped the smoothed PSI is >> 1."""
    rows = []
    eid = 0
    for i in range(500):  # reference window: values in [0, 4]
        rows.append((eid, i, 1, "drifted", i % 5))
        eid += 1
    for i in range(500):  # current window: values in [5, 9]
        rows.append((eid, 10_000 + i, 1, "drifted", 5 + i % 5))
        eid += 1
    d = _write_events(spark, tmp_path, rows)
    r = event_value_psi_drift(spark, d).collect()[0]
    assert r["psi"] > 0.25


# ---------------------------------------------------------------- MAD ----


def test_mad_fence_survives_contamination_that_breaks_zscore(spark, tmp_path):
    """Plant a 19% outlier mass (200 of 1050 points at 2000 against a
    95–105 cluster).  The contamination drags mean≈462 and σ≈670, so the
    classical mean+3σ fence (≈2470) catches NOTHING — the textbook
    breakdown.  The median/MAD fence must stay anchored to the cluster
    (med≈100, MAD≤5) and count exactly the 200 planted points."""
    rows = []
    for i in range(850):
        rows.append((i, i, 1, "metric", 100 + (i % 11) - 5))  # 95..105
    for i in range(200):
        rows.append((850 + i, 850 + i, 1, "metric", 2000.0))
    d = _write_events(spark, tmp_path, rows)
    r = event_value_outliers_mad(spark, d).collect()[0]
    assert 95 <= r["med"] <= 105
    assert 0 < r["mad"] <= 5
    assert r["n_outliers"] == 200
    assert r["n_events"] == 1050
    # the point of MAD: the classical fence misses every planted outlier
    e = spark.read.parquet(os.path.join(d, "events.parquet"))
    s = e.agg(F.avg("value").alias("m"), F.stddev("value").alias("sd")).collect()[0]
    z_fence_hits = e.where(F.col("value") > s["m"] + 3 * s["sd"]).count()
    assert z_fence_hits == 0


def test_mad_zero_outliers_on_clean_data(spark, tmp_path):
    """No contamination → no alarms (the fence is 3·1.4826·MAD ≈ the
    cluster's own spread; nothing in a bounded uniform cluster exceeds
    it)."""
    rows = [(i, i, 1, "clean", 100 + (i % 7) - 3) for i in range(700)]
    d = _write_events(spark, tmp_path, rows)
    r = event_value_outliers_mad(spark, d).collect()[0]
    assert r["n_outliers"] == 0


# --------------------------------------------------------------- Gini ----


def test_gini_zero_when_perfectly_even(spark, tmp_path):
    """Every user has the same count → G = 0 exactly (the ranked-sum
    identity collapses: 2·Σr·n̄/(k·k·n̄) − (k+1)/k = 0)."""
    rows = []
    eid = 0
    for u in range(1, 51):
        for _ in range(4):
            rows.append((eid, eid, u, "e", 1.0))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    r = user_activity_gini(spark, d).collect()[0]
    assert r["n_users"] == 50
    assert r["mean_events"] == 4.0
    assert r["gini"] == 0.0


def test_gini_matches_linear_distribution_closed_form(spark, tmp_path):
    """User i has exactly i events (i = 1..k): the closed form is
    G = (k−1)/(3k) — with k=30, 29/90 ≈ 0.3222.  A wrong rank identity
    (off-by-one in r, or (k−1) vs (k+1)) lands measurably elsewhere."""
    k = 30
    rows = []
    eid = 0
    for u in range(1, k + 1):
        for _ in range(u):
            rows.append((eid, eid, u, "e", 1.0))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    r = user_activity_gini(spark, d).collect()[0]
    assert r["n_users"] == k
    assert abs(r["gini"] - (k - 1) / (3 * k)) < 5e-4


def test_gini_approaches_one_under_extreme_concentration(spark, tmp_path):
    """One user generates ~everything (10k events) beside 49 one-event
    users → G must be near its upper bound (analytically ≈ 0.97 here),
    and strictly within (0, 1)."""
    rows = [(i, i, 999, "e", 1.0) for i in range(10_000)]
    for u in range(1, 50):
        rows.append((10_000 + u, 10_000 + u, u, "e", 1.0))
    d = _write_events(spark, tmp_path, rows)
    r = user_activity_gini(spark, d).collect()[0]
    assert 0.9 < r["gini"] < 1.0


# --------------------------------------------------------------- Zipf ----


def test_zipf_slope_recovers_planted_power_law(spark, tmp_path):
    """A corpus whose token frequencies are c_r = round(3000/r) is a
    textbook Zipf(1) sample: the log-log regression over the ranked
    counts must recover slope ≈ −1 with near-perfect fit.  (Integer
    rounding flattens the deep tail slightly, so the band is ±0.1.)"""
    parts = []
    for r in range(1, 151):
        parts.extend([f"tok{r:03d}"] * round(3000 / r))
    text = " ".join(parts)
    df = spark.createDataFrame(
        [(1, text, "en", "synthetic", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    r = corpus_zipf_slope(spark, d).collect()[0]
    assert r["n_types"] == 150
    assert -1.1 < r["zipf_slope"] < -0.9
    assert r["r2"] > 0.97


def test_zipf_flat_corpus_has_zero_slope(spark, tmp_path):
    """Uniform token frequencies (the templated/generated-corpus
    signature the monitor exists to catch) → slope ≈ 0: maximally far
    from natural text's −1."""
    parts = []
    for r in range(1, 101):
        parts.extend([f"tok{r:03d}"] * 20)
    text = " ".join(parts)
    df = spark.createDataFrame(
        [(1, text, "en", "synthetic", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    r = corpus_zipf_slope(spark, d).collect()[0]
    assert abs(r["zipf_slope"]) < 0.01


def test_t_closeness_identical_distribution_is_zero(spark, tmp_path):
    """A group whose sensitive-band mix equals the global mix has TVD 0;
    validity check for customer_t_closeness (the cross-engine gate only
    proves agreement)."""
    import os

    from oltp_to_data_warehouse_pipeline_spark.plans.queryset import (
        customer_t_closeness,
    )

    # two groups, both 50% LOW / 50% MID -> both match global exactly
    rows = []
    ck = 0
    for seg in ("S1", "S2"):
        for bal in (1000.0, 1000.0, 5000.0, 5000.0):
            rows.append((ck, 0, seg, bal))
            ck += 1
    c = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    n = spark.createDataFrame([(0, "NOWHERE")], "n_nationkey long, n_name string")
    d = str(tmp_path)
    c.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    n.write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))
    out = {r["segment"]: r for r in customer_t_closeness(spark, d).collect()}
    assert out["S1"]["tvd"] == 0.0 and not out["S1"]["above_t"]
    assert out["S2"]["tvd"] == 0.0 and not out["S2"]["above_t"]


def test_t_closeness_concentrated_group_flagged(spark, tmp_path):
    """Hand-computed TVDs: an all-LOW group vs a DEBT/LOW/MID global is
    0.5 (flagged); a uniform-thirds group vs the same global is 1/6
    (under t=0.2)."""
    import os

    from oltp_to_data_warehouse_pipeline_spark.plans.queryset import (
        customer_t_closeness,
    )

    rows = [(i, 0, "A", 1000.0) for i in range(10)]  # 10x LOW
    rows += [(100 + i, 0, "B", -10.0) for i in range(10)]  # 10x DEBT
    rows += [(200 + i, 0, "B", 1000.0) for i in range(10)]  # 10x LOW
    rows += [(300 + i, 0, "B", 5000.0) for i in range(10)]  # 10x MID
    c = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    n = spark.createDataFrame([(0, "NOWHERE")], "n_nationkey long, n_name string")
    d = str(tmp_path)
    c.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    n.write.mode("overwrite").parquet(os.path.join(d, "nation.parquet"))
    out = {r["segment"]: r for r in customer_t_closeness(spark, d).collect()}
    # global: DEBT 0.25, LOW 0.5, MID 0.25
    assert out["A"]["tvd"] == 0.5 and out["A"]["above_t"]
    assert abs(out["B"]["tvd"] - round(1 / 6, 6)) < 1e-12
    assert not out["B"]["above_t"]
