"""HyperLogLog distinct-count sketches (Flajolet et al., AofA 2007) as a
plain RELATION — the constant-size, mergeable complement to the KMV
bottom-k sketch (`operators/kmv.py`).

Why both: KMV supports exact set algebra on the stored hashes
(intersection/union estimates via the k-minimum values); HLL stores only
``m`` 6-bit-ish registers — 128 rows per group here — so at millions of
groups it is the cheaper rollup primitive, and register-wise MAX is the
whole merge story (idempotent, commutative, associative: replay-safe the
same way the KMV store is).

Representation: one row per (group, register j, max rho) — a relation any
engine can compute, merge with GROUP BY j MAX(rho), and audit.  The hash
is the repo's portable 48-bit md5 fold: bucket = top ``b`` bits, rho =
leading-zero count of the remaining ``48-b`` bits + 1 — both exact integer
expressions (bit_length via the minimal binary-string length, no floats),
so the REGISTER RELATION is bit-identical across engines and the
differential gate can hash-match it directly.

The estimator is the standard bias-corrected harmonic mean α·m²/Σ2^(−M_j)
with the small-range linear-counting correction m·ln(m/V).  Every 2^(−M)
term is an exact dyadic double (computed as 1/(1<<M), never pow), so the
sum is exact and ORDER-INDEPENDENT — the float-sum-order trap is
structurally absent; the one transcendental (ln, small-range only) is
rounded at 4dp like every float the oracle compares.

Scale: sketch build is one shuffle keyed (group, j) with map-side partial
MAX; merged sketches are ≤ m rows per group forever.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.util import ensure_min_parallelism, md5_fold48

#: register count (2^7) and the split of the 48-bit fold
B_BITS = 7
M = 1 << B_BITS
_REST_BITS = 48 - B_BITS  # 41
#: Flajolet bias constant for m ≥ 128
ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    seed: str = "hll|",
) -> DataFrame:
    """(group…, j, r): the register relation — for each group and bucket
    j = h >> 41, the max rho (leading zeros of the low 41 bits + 1).
    NULL keys are excluded (md5 of NULL has no defined register)."""
    base = (
        ensure_min_parallelism(df)
        .where(F.col(key_col).isNotNull())
        .select(*group_cols, md5_fold48(key_col, seed).alias("__h"))
    )
    rest = F.col("__h") % F.lit(1 << _REST_BITS)
    rho = F.when(rest == 0, F.lit(_REST_BITS + 1)).otherwise(
        F.lit(_REST_BITS + 1) - F.length(F.bin(rest))
    )
    return (
        base.select(
            *group_cols,
            F.expr(f"__h div {1 << _REST_BITS}").alias("j"),
            rho.cast("int").alias("r"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("r").alias("r"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union of sketches = register-wise MAX — idempotent (a sketch merged
    with itself is itself), so replay-safe with no ledger."""
    return sketches.groupBy(*group_cols, "j").agg(F.max("r").alias("r"))


def hll_estimate(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group…, est_distinct): bias-corrected harmonic estimate with the
    small-range linear-counting correction, rounded to 4dp.  Empty
    registers contribute 2⁰ = 1 to the harmonic sum (V = m − present)."""
    # 2^(−r) as an exact dyadic: 1 / (1 << r) — never pow() (whose exactness
    # on these cases is implementation grace, not an IEEE guarantee)
    inv = F.expr("1.0 / CAST(shiftleft(1L, r) AS DOUBLE)")
    agg = sketches.groupBy(*group_cols).agg(
        F.sum(inv).alias("__s"),
        F.count(F.lit(1)).alias("__present"),
    )
    v = F.lit(M) - F.col("__present")
    s_full = F.col("__s") + v.cast("double")  # empty buckets: 2^0 each
    e = F.lit(ALPHA * M * M) / s_full
    est = F.when(
        (e <= F.lit(2.5 * M)) & (v > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v.cast("double")),
    ).otherwise(e)
    return agg.select(
        *group_cols,
        (F.round(est, 4) + F.lit(0.0)).alias("est_distinct"),
    )


def standard_error() -> float:
    """Theoretical relative standard error 1.04/√m (≈ 9.2% at m=128)."""
    return 1.04 / math.sqrt(M)
