"""Priority sampling: exact parity with an independent Python twin of the
quantized-priority arithmetic, estimator exactness at τ = 0, replay /
repartition determinism, overflow refusal."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators.sampling import (
    MAX_WEIGHT,
    SCALE_BITS,
    priority_sample,
    priority_sample_estimate,
)


def _fold48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _py_key(doc_id: int, w: int) -> int:
    return (w << SCALE_BITS) // (_fold48(f"ps|{doc_id}") + 1)


def _pop(spark, n=200):
    rows = [(i, (i * 37) % 97 + 1) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, w bigint"), rows


def test_sample_matches_python_twin_exactly(spark):
    df, rows = _pop(spark)
    k = 25
    got = sorted(
        (r["doc_id"], r["w"], r["priority"])
        for r in priority_sample(df, "doc_id", "w", k).collect()
    )
    want = sorted(
        (i, w, _py_key(i, w))
        for i, w in sorted(rows, key=lambda t: (-_py_key(t[0], t[1]), t[0]))[:k]
    )
    assert got == want


def test_estimator_matches_python_twin_and_is_exact_at_small_n(spark):
    df, rows = _pop(spark)
    k = 25
    # python twin of the integer-split estimator
    ordered = sorted(rows, key=lambda t: (-_py_key(t[0], t[1]), t[0]))
    tau = _py_key(*ordered[k]) if len(ordered) > k else 0
    big = sum(w for i, w in ordered[:k] if tau <= w // 4)
    small = sum(1 for i, w in ordered[:k] if tau > w // 4)
    want = round(float(big) + float(small * tau * 4), 4)
    r = priority_sample_estimate(df, "doc_id", "w", k).collect()
    assert len(r) == 1 and r[0]["k"] == k
    assert r[0]["est_total"] == want

    # estimator should land near the truth on this mild weight spread
    truth = sum(w for _, w in rows)
    assert abs(r[0]["est_total"] - truth) / truth < 0.5

    # population <= k: tau = 0, estimate IS the exact total
    small_df = spark.createDataFrame(rows[:10], "doc_id bigint, w bigint")
    r2 = priority_sample_estimate(small_df, "doc_id", "w", k).collect()
    assert r2[0]["est_total"] == float(sum(w for _, w in rows[:10]))


def test_deterministic_under_repartition(spark):
    df, _ = _pop(spark)
    a = priority_sample(df, "doc_id", "w", 10).collect()
    b = priority_sample(df.repartition(13), "doc_id", "w", 10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_null_and_nonpositive_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 7)],
        "doc_id bigint, w bigint",
    )
    got = {r["doc_id"] for r in priority_sample(df, "doc_id", "w", 10).collect()}
    assert got == {1, 5}


def test_oversized_weight_raises_not_wraps(spark):
    df = spark.createDataFrame(
        [(1, MAX_WEIGHT + 1)], "doc_id bigint, w bigint"
    )
    with pytest.raises(Exception, match="priority_sample"):
        priority_sample(df, "doc_id", "w", 5).collect()


def test_topk_plan_has_no_global_sort(spark):
    df, _ = _pop(spark)
    plan = priority_sample(df, "doc_id", "w", 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_fractional_weight_raises_not_truncates(spark):
    """cast('bigint') would silently floor 0.7 -> 0, degenerating the
    sample to the k smallest ids with a ~0 estimate (round-9 review
    finding) — fractional weights must raise with scaling guidance."""
    df = spark.createDataFrame(
        [(1, 0.7), (2, 0.9)], "doc_id bigint, w double"
    )
    with pytest.raises(Exception, match="integer-valued"):
        priority_sample(df, "doc_id", "w", 2).collect()
    # integer-VALUED doubles are fine (the cast is lossless)
    ok = spark.createDataFrame([(1, 5.0), (2, 9.0)], "doc_id bigint, w double")
    assert len(priority_sample(ok, "doc_id", "w", 2).collect()) == 2


def test_stratified_sample_exact_quota_and_python_twin(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators.sampling import (
        stratified_priority_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3], (i * 13) % 50 + 1) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, g string, w bigint")
    out = stratified_priority_sample(df, "doc_id", "w", ["g"], k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["g"], []).append((r["doc_id"], r["w"], r["priority"]))
    assert set(got) == {"a", "b", "c"}
    for g, members in got.items():
        assert len(members) == 5
        want = sorted(
            ((i, w, _py_key(i, w)) for i, gg, w in rows if gg == g),
            key=lambda t: (-t[2], t[0]),
        )[:5]
        assert sorted(members) == sorted(want)
