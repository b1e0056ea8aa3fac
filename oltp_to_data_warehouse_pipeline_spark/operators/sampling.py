"""Priority sampling — weighted sampling without replacement with an
unbiased subset-sum estimator (Duffield, Lund & Thorup, JACM 54(6) 2007).

The LLM-pipeline use case: pick k documents with inclusion probability
(approximately) proportional to a weight — token count, quality score —
and still be able to estimate corpus-level totals from the sample alone.
Uniform sampling over-represents short junk; Bernoulli-by-weight gives a
random sample SIZE; priority sampling gives exactly k rows AND the
estimator.

Mechanics: each row draws priority q = w / u with u ~ Uniform(0, 1]; the
sample is the k largest priorities, and with τ = the (k+1)-th priority,
Σ̂ = Σ_{i ∈ S} max(w_i, τ) is an unbiased estimator of the total weight
(DLT'07 Thm 1).

Engine-portable determinism: u comes from the repo's 48-bit md5 fold
(``util.md5_fold48``) — u = (h+1)/2⁴⁸ — and the priority is quantized to
the exact integer key ``(w << SCALE_BITS) div (h+1)`` so both engines
rank identically with NO float arithmetic anywhere on the ranking path
(floor-div of positive bigints; ties broken by the row key).  The
estimator is likewise assembled from exact integer parts — see
:func:`priority_sample_estimate`.

Scale shape: one narrow map to compute keys, then a global top-(k+1) —
Spark's TakeOrderedAndProject (per-partition heap, then a merge of k+1
rows per partition), never a global sort shuffle.  The estimator folds
the (k+1)-row relation — driver-sized by construction, and its one
global window feeds from that Limit (the repo's plan invariant for
global windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.util import ensure_min_parallelism, md5_fold48

#: Priority quantization: key = (w << SCALE_BITS) div (h + 1).  With
#: h+1 ∈ [1, 2⁴⁸] the key needs ⌈log₂ w⌉ + SCALE_BITS bits; weights are
#: runtime-guarded to 2⁶² >> SCALE_BITS (≈ 6.5·10⁴) so the key provably
#: fits BIGINT.  Quantization collisions only coarsen the u-tiebreak
#: (resolved by the row key); they never reorder priorities that differ
#: by more than one quantum.
SCALE_BITS = 46
_SCALE = 1 << SCALE_BITS
MAX_WEIGHT = (1 << 62) // _SCALE


def _with_key(df: DataFrame, key_col: str, weight_col: str, seed: str) -> DataFrame:
    """(input cols…, __w, __key): the exact-integer quantized priority.

    Integer floor-division via the SQL ``div`` operator — a plain ``/``
    is DOUBLE division, and a 2⁵⁹ numerator has already lost low bits at
    53 mantissa bits, so ``floor(a / b)`` would mis-rank near-tied
    priorities.  Oversized weights raise (a silent wrap would corrupt the
    ranking; a silent filter would corrupt the estimator).
    """
    h = md5_fold48(key_col, seed)
    return (
        ensure_min_parallelism(df)
        .where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__w", F.col(weight_col).cast("bigint"))
        .withColumn("__h", h)
        # Weights are INTEGER by contract (token counts, byte sizes;
        # scale a quality score to e.g. round(score·1000) first).  A
        # fractional weight would silently truncate — cast(0.7) = 0 makes
        # every priority 0 and the "sample" degenerates to the k smallest
        # ids with a ~0 estimate (round-9 review finding) — so both
        # non-integer and oversized weights raise loudly.
        .withColumn(
            "__key",
            F.expr(
                f"CASE WHEN CAST(__w AS DOUBLE) != CAST({weight_col} AS DOUBLE) THEN "
                f"CAST(raise_error('priority_sample: weight_col must be "
                f"integer-valued (scale scores, e.g. round(score*1000)); "
                f"got a fractional weight') AS BIGINT) "
                f"WHEN __w > {MAX_WEIGHT} THEN "
                f"CAST(raise_error('priority_sample: weight exceeds "
                f"{MAX_WEIGHT} (46-bit quantization bound) — rescale "
                f"weights') AS BIGINT) "
                f"ELSE (__w * {_SCALE}) div (__h + 1) END"
            ),
        )
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "ps|",
) -> DataFrame:
    """The k-row priority sample: (key_col, weight_col, priority) for the
    k largest quantized priorities; deterministic tiebreak by row key.
    Rows with NULL or non-positive weight never qualify (a zero weight
    has priority 0; NULL has no defined priority — both are excluded up
    front, the same exclusion the estimator's total ignores)."""
    t = _with_key(df, key_col, weight_col, seed)
    return (
        t.orderBy(F.col("__key").desc(), F.col(key_col).asc())
        .limit(k)
        .select(key_col, weight_col, F.col("__key").alias("priority"))
    )


def priority_sample_estimate(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "ps|",
) -> DataFrame:
    """One row ``(k, est_total)`` — the DLT'07 unbiased subset-sum
    estimate of ``SUM(weight_col)`` computed from the k-row sample alone.

    With u = (h+1)/2⁴⁸ the true priority is q = w/u = w·2⁴⁸/(h+1) =
    4·key + O(4) — i.e. the stored key is q quantized to units of 4, so
    τ in WEIGHT units is ``4·key_{k+1}`` and the estimator is
    Σ̂ = Σ_{i∈S} max(w_i, 4·τ′) with τ′ the (k+1)-th stored key.  When
    the population has ≤ k rows, τ′ = 0 and the estimate is the exact
    total.  (The ≤2-bit quantization of q only perturbs which of two
    near-tied rows is sampled — the estimator stays self-consistent
    because the same quantized priorities define both S and τ.)

    Exact cross-engine arithmetic — the float-sum-order trap does not
    apply: every term is an INTEGER (w-side: an exact BIGINT sum;
    τ-side: cnt·4·τ′ in DECIMAL(38,0), products provably < 10³⁸), and
    the single final addition happens after exact casts.
    """
    t = _with_key(df, key_col, weight_col, seed)
    topk1 = (
        t.orderBy(F.col("__key").desc(), F.col(key_col).asc())
        .limit(k + 1)
        .select(key_col, "__w", "__key")
    )
    w_rank = Window.orderBy(F.col("__key").desc(), F.col(key_col).asc())
    ranked = topk1.withColumn("__rn", F.row_number().over(w_rank))
    return ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == k + 1, F.col("__key"))), F.lit(0)
        ).alias("__tau"),
    ).select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("__tau"),
    ).crossJoin(
        # re-derive the per-row max split with τ in scope: one more pass
        # over the bounded (k+1)-row relation
        ranked.select(
            F.col("__rn").alias("__rn2"),
            F.col("__w").alias("__w2"),
        )
    ).where(F.col("__rn2") <= k).agg(
        F.max("k").alias("k"),
        # w_i ≥ 4·τ′ decided exactly in BIGINT as τ′ ≤ w div 4 (integer
        # equivalence; 4·τ′ itself could overflow at the h=0 extreme)
        F.sum(
            F.when(F.col("__tau") <= F.expr("__w2 div 4"), F.col("__w2")).otherwise(F.lit(0))
        ).alias("__big_w"),
        F.sum(
            F.when(F.col("__tau") > F.expr("__w2 div 4"), F.lit(1)).otherwise(F.lit(0))
        ).alias("__small_n"),
        F.max("__tau").alias("__tau_m"),
    ).select(
        F.col("k"),
        F.round(
            F.col("__big_w").cast("double")
            + (
                F.col("__small_n").cast("decimal(38,0)")
                * F.col("__tau_m").cast("decimal(38,0)")
                * F.lit(4)
            ).cast("double"),
            4,
        ).alias("est_total"),
    )


def stratified_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    group_cols: list[str],
    k: int,
    seed: str = "ps|",
) -> DataFrame:
    """Per-stratum priority sample: the k largest quantized priorities
    WITHIN each ``group_cols`` combination (language, source, shard…) —
    exactly k rows per stratum with within-stratum inclusion probability
    ≈ proportional to weight.  The corpus-mixture use case: weight-aware
    down-sampling that still guarantees every stratum its quota.

    Plan shape: the ranking window is PARTITIONED by the stratum (one
    keyed exchange, no global ordering anywhere) — at a million strata
    this is the standard high-cardinality window, never a single
    partition.  Same integer-exact priority as :func:`priority_sample`,
    so both engines produce the identical sample per stratum.
    """
    t = _with_key(df, key_col, weight_col, seed)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__key").desc(), F.col(key_col).asc()
    )
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            *group_cols, key_col, weight_col, F.col("__key").alias("priority")
        )
    )
