"""Differential unit tests for the two engine-parity primitives round 6
leans on: the shared 48-bit md5 fold (bloom bits, CMS cells, checksums)
and the integer-quantized squared-distance summation (k-means).  The
registered queries exercise these through full pipelines; these tests pin
the primitives themselves against DuckDB on adversarial inputs, so a
drift shows up here with a one-line diff instead of as an opaque
hash-gate mismatch."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.operators.similarity import (
    as_double_vec,
    sq_dist_exact,
)
from oltp_to_data_warehouse_pipeline_spark.util import md5_fold48

DUCK_FOLD = (
    "CAST(list_sum(list_transform(generate_series(1, 12), i -> "
    "(strpos('0123456789abcdef', substring(md5({e}), i, 1)) - 1)::BIGINT"
    " << (4 * (12 - i)))) AS BIGINT)"
)


def test_md5_fold48_matches_duckdb(spark):
    keys = [0, 1, 42, 2**31 - 1, 2**63 - 1, -17]
    prefixes = ["", "bf0|", "bf1|", "cm2|"]
    rows = [(k,) for k in keys]
    df = spark.createDataFrame(rows, "k bigint")
    con = duckdb.connect()
    for p in prefixes:
        got = {
            r["k"]: r["h"]
            for r in df.select("k", md5_fold48(F.col("k"), p).alias("h")).collect()
        }
        for k in keys:
            expr = DUCK_FOLD.format(e=f"'{p}' || CAST({k} AS VARCHAR)" if p else f"CAST({k} AS VARCHAR)")
            want = con.execute(f"SELECT {expr}").fetchone()[0]
            assert got[k] == want, (p, k)


def _duck_sq_dist(con, a: list[float], b: list[float]) -> float:
    terms = ", ".join(
        f"CAST(floor(({x!r} - {y!r}) * ({x!r} - {y!r}) * 1e8 + 0.5) AS BIGINT)"
        for x, y in zip(a, b)
    )
    return con.execute(
        f"SELECT CAST(CAST(list_sum([{terms}]) AS BIGINT) AS DOUBLE) / 1e8"
    ).fetchone()[0]


def test_sq_dist_exact_matches_duckdb_on_adversarial_values(spark):
    """Vectors engineered near 1e-8 quantization boundaries plus seeded
    random ones: the Spark fold and the DuckDB replay must agree exactly
    (the old round(t,8)-into-DECIMAL rule did NOT — Spark rounds the
    shortest decimal repr, DuckDB the scaled binary value)."""
    import random

    rng = random.Random(6)
    cases = [
        # exact boundary-ish terms: diffs whose square is near k*1e-8 + 5e-9
        ([0.0, 1e-4, 2**-13], [0.0, 0.0, 0.0]),
        ([3.162277660168379e-4] * 4, [0.0] * 4),  # sq ≈ 1e-7 + noise
        ([1.0, -1.0, 0.5], [-1.0, 1.0, -0.5]),
    ] + [
        (
            [rng.uniform(-1, 1) for _ in range(8)],
            [rng.uniform(-1, 1) for _ in range(8)],
        )
        for _ in range(25)
    ]
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "i int, a array<double>, b array<double>",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i", sq_dist_exact(as_double_vec("a"), as_double_vec("b")).alias("d")
        ).collect()
    }
    for i, (a, b) in enumerate(cases):
        want = _duck_sq_dist(con, a, b)
        assert got[i] == pytest.approx(want, abs=0.0), f"case {i}: {got[i]!r} != {want!r}"


def test_sq_dist_exact_is_order_independent(spark):
    """Permuting the dimensions must not change the result — the integer
    summands make the fold commutative in exact arithmetic."""
    a = [0.1, -0.7, 0.333333333, 1e-9]
    b = [0.09999999, 0.7, -0.333333334, 0.0]
    perm = [2, 0, 3, 1]
    df = spark.createDataFrame(
        [(a, b, [a[i] for i in perm], [b[i] for i in perm])],
        "a array<double>, b array<double>, ap array<double>, bp array<double>",
    )
    r = df.select(
        sq_dist_exact(as_double_vec("a"), as_double_vec("b")).alias("d1"),
        sq_dist_exact(as_double_vec("ap"), as_double_vec("bp")).alias("d2"),
    ).collect()[0]
    assert r["d1"] == r["d2"]
