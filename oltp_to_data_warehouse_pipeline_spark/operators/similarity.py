"""Embedding similarity search (LLM-pipeline extension).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed variant
(random hyperplane signs) as the scale path.  Vector math is expressed with
``zip_with``/``aggregate`` higher-order functions — JVM-side, codegen'd, no
Python in the loop.  For very wide vectors (≥1k dims) a pandas_udf batch dot
product can be swapped in; at 64-dim the HOF form wins (no Arrow transfer).

Scale posture: queries are broadcast (top-k is usually few-queries ×
many-candidates); candidates never shuffle for the brute-force path.  The
LSH variant turns the cross join into an equi-join on bucket signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.util import ensure_min_parallelism


def as_double_vec(c: Column | str) -> Column:
    """array<float> → array<double> so dot products run in double precision
    (keeps parity with any double-math oracle and avoids float drift)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential, deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest candidates.

    ``queries`` is broadcast; candidates stream past it (one narrow stage),
    then a per-query top-k via window row_number (shuffle keyed by query id —
    small, = |queries| keys; for many queries switch the final ranking to a
    per-partition heap via mapInPandas).
    Excludes self-matches.  Deterministic tiebreak: (sim desc, candidate id).
    """
    cand = (
        ensure_min_parallelism(emb)
        .select(F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cvec"))
        .withColumn("__cnorm", l2_norm(F.col("__cvec")))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qvec")
    ).withColumn("__qnorm", l2_norm(F.col("__qvec")))

    scored = (
        cand.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", dot(F.col("__qvec"), F.col("__cvec")) / (F.col("__qnorm") * F.col("__cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def hyperplane_buckets(
    emb: DataFrame, planes: list[list[float]], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (sign bit per plane).

    ``planes`` are fixed (seeded) hyperplane normals, embedded as array
    literals — no data shuffle to assign buckets.  Vectors in the same
    bucket are cosine-close with high probability; ANN search then only
    scores within-bucket candidates (equi-join on ``bucket``).
    """
    vec = as_double_vec(vec_col)
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(vec, lit) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return emb.select(F.col(id_col), F.col(vec_col), bucket.cast("int").alias("bucket"))


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket both sides, score within buckets.

    Recall < 1.0 by construction (that's the approximation); multi-probe =
    run with several plane sets and union.  The candidate join is an
    equi-join on bucket — linear shuffle, no cross join: this is the path
    that survives 10⁹+ vectors.
    """
    cand = hyperplane_buckets(ensure_min_parallelism(emb), planes, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__craw"), "bucket"
    )
    q = hyperplane_buckets(queries, planes, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qraw"), "bucket"
    )
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__qvec", as_double_vec("__qraw"))
        .withColumn("__cvec", as_double_vec("__craw"))
        .withColumn(
            "sim",
            dot(F.col("__qvec"), F.col("__cvec"))
            / (l2_norm(F.col("__qvec")) * l2_norm(F.col("__cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 4).alias("sim"))
    )


def seeded_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure Python LCG — no numpy
    dependency in the plan layer, reproducible across runs/engines)."""
    state = seed or 1
    planes: list[list[float]] = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            # Park–Miller LCG
            state = (state * 48271) % 2147483647
            row.append(state / 2147483647.0 - 0.5)
        planes.append(row)
    return planes
