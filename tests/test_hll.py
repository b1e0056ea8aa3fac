"""HyperLogLog: python-twin register parity, merge = register-wise max /
idempotence, estimator accuracy within theory, small-range correction."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators import hll


def _fold48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _py_register(key) -> tuple[int, int]:
    h = _fold48(f"hll|{key}")
    j, rest = h >> 41, h & ((1 << 41) - 1)
    rho = 42 if rest == 0 else 42 - rest.bit_length()
    return j, rho


def test_registers_match_python_twin(spark):
    keys = [f"u{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "user_id string").withColumn(
        "g", F.lit(1)
    )
    got = sorted(
        (r["j"], r["r"]) for r in hll.hll_sketch(df, "user_id", ["g"]).collect()
    )
    want: dict[int, int] = {}
    for k in keys:
        j, rho = _py_register(k)
        want[j] = max(want.get(j, 0), rho)
    assert got == sorted(want.items())


def test_merge_is_registerwise_max_and_idempotent(spark):
    a = spark.createDataFrame([(1, 3, 5), (1, 7, 2)], "g int, j int, r int")
    b = spark.createDataFrame([(1, 3, 4), (1, 9, 1)], "g int, j int, r int")
    merged = sorted(
        (r["j"], r["r"])
        for r in hll.hll_merge(a.unionByName(b), ["g"]).collect()
    )
    assert merged == [(3, 5), (7, 2), (9, 1)]
    # self-merge = identity (replay safety)
    again = sorted(
        (r["j"], r["r"])
        for r in hll.hll_merge(a.unionByName(a), ["g"]).collect()
    )
    assert again == [(3, 5), (7, 2)]


def test_estimate_within_theoretical_error(spark):
    n = 5000
    df = spark.createDataFrame(
        [(f"user-{i}",) for i in range(n)], "user_id string"
    ).withColumn("g", F.lit(1))
    sk = hll.hll_sketch(df, "user_id", ["g"])
    est = hll.hll_estimate(sk, ["g"]).collect()[0]["est_distinct"]
    # 4 sigma of the 1.04/sqrt(m) relative error
    assert abs(est - n) / n < 4 * hll.standard_error()


def test_small_range_linear_counting(spark):
    # 3 distinct keys: far below 2.5m -> linear counting m*ln(m/V)
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("a",)], "user_id string"
    ).withColumn("g", F.lit(1))
    sk = hll.hll_sketch(df, "user_id", ["g"])
    present = sk.count()
    est = hll.hll_estimate(sk, ["g"]).collect()[0]["est_distinct"]
    want = round(hll.M * math.log(hll.M / (hll.M - present)), 4)
    assert abs(est - want) < 1e-9
    assert abs(est - 3) < 1.0  # and it is actually close to 3
