"""Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
Language Models: ... Gopher", appendix A1.1 repetition filters).

A core LLM-curation heuristic the corpus pipeline (plans/curation.py) can
gate on: documents dominated by a few repeated n-grams are boilerplate /
spam / scraper artifacts.  Two families, computed per document over word
n-grams (the fixtures carry no newlines, so the paper's line/paragraph
variants degenerate — the n-gram family is the general form):

- ``top_{n}_frac``: characters of the MOST FREQUENT n-gram (count x its
  length) over total characters — n = 2..4 in the paper;
- ``dup_{n}_frac``: fraction of token POSITIONS covered by n-grams that
  occur more than once — the position-UNION, so overlapping duplicate
  n-grams are not double-counted (the subtlety the paper calls out) —
  n = 5..10 in the paper.

Scale shape: one explode per (token-position x requested n) — linear in
corpus size x |ns| — then aggregates keyed by (doc, n[, gram]): millions
of small groups, never a global window or collect.  Every emitted
fraction is a single integer/integer division (no float summation, so no
cross-engine accumulation-order drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.util import ensure_min_parallelism


def _occurrences(df: DataFrame, id_col: str, text_col: str, ns: list[int]) -> DataFrame:
    """(id, n, i, g, m, chars): every n-gram occurrence for every requested
    n, with its start position, the doc's token count and char length."""
    toks = F.split(F.col(text_col), " ")
    base = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.size(toks).alias("m"),
        F.length(text_col).alias("chars"),
    )
    with_n = base.select(
        "id", "toks", "m", "chars",
        F.explode(F.array(*[F.lit(n) for n in ns])).alias("n"),
    ).where(F.col("m") >= F.col("n"))
    return (
        with_n.select(
            "id", "m", "chars", "n", "toks",
            F.explode(F.sequence(F.lit(0), F.col("m") - F.col("n"))).alias("i"),
        )
        .withColumn("g", F.concat_ws(" ", F.slice("toks", F.col("i") + 1, F.col("n"))))
        .drop("toks")
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: list[int] = (2, 3),
    dup_ns: list[int] = (5, 10),
) -> DataFrame:
    """One row per document: ``top_{n}_frac`` for each n in ``top_ns`` and
    ``dup_{n}_frac`` for each n in ``dup_ns`` (column order: top then dup,
    each ascending n), plus ``n_tokens``.  Documents shorter than n tokens
    score 0.0 for that signal.  Deterministic: the top n-gram tie-breaks
    lexicographically, every fraction is one exact integer division
    rounded to 4 decimals (+0.0 normalizes any -0.0).
    """
    ns = sorted(set(list(top_ns) + list(dup_ns)))
    occ = _occurrences(df, id_col, text_col, list(ns))

    # --- top-frequency n-gram, char fraction ---
    cnt = occ.groupBy("id", "n", "g").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("chars").alias("chars"),
    )
    w = Window.partitionBy("id", "n").orderBy(F.col("c").desc(), F.col("g").asc())
    top = (
        cnt.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "id", "n",
            (F.col("c") * F.length("g")).alias("top_chars"),
            "chars",
        )
    )

    # --- duplicated n-gram token coverage (position union) ---
    dup_cover = (
        occ.withColumn(
            "__c", F.count(F.lit(1)).over(Window.partitionBy("id", "n", "g"))
        )
        .where(F.col("__c") >= 2)
        .select(
            "id", "n", "m",
            F.explode(F.sequence(F.col("i"), F.col("i") + F.col("n") - 1)).alias("p"),
        )
        .groupBy("id", "n")
        .agg(F.count_distinct("p").alias("covered"), F.first("m").alias("m"))
    )

    frac4 = lambda num, den: (  # noqa: E731
        F.round(num.cast("double") / den.cast("double"), 4) + F.lit(0.0)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )
    top_agg = [
        F.coalesce(
            F.max(F.when(F.col("n") == n, frac4(F.col("top_chars"), F.col("chars")))),
            F.lit(0.0),
        ).alias(f"top_{n}_frac")
        for n in sorted(top_ns)
    ]
    out = base.join(
        top.groupBy("id").agg(*top_agg), "id", "left"
    )
    dup_agg = [
        F.coalesce(
            F.max(F.when(F.col("n") == n, frac4(F.col("covered"), F.col("m")))),
            F.lit(0.0),
        ).alias(f"dup_{n}_frac")
        for n in sorted(dup_ns)
    ]
    out = out.join(dup_cover.groupBy("id").agg(*dup_agg), "id", "left")
    cols = (
        [F.col("id").alias(id_col), "n_tokens"]
        + [
            F.coalesce(f"top_{n}_frac", F.lit(0.0)).alias(f"top_{n}_frac")
            for n in sorted(top_ns)
        ]
        + [
            F.coalesce(f"dup_{n}_frac", F.lit(0.0)).alias(f"dup_{n}_frac")
            for n in sorted(dup_ns)
        ]
    )
    return out.select(*cols)
