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

The shuffle NEVER carries gram strings: every fraction depends only on a
gram's IDENTITY (grouping) and CHAR LENGTH, so occurrences exchange
``(xxhash64(gram), length(gram))`` — 12 bytes — instead of the ~n-token
concatenated string.  At a 100 TB corpus the string-gram exchange would
be several times corpus size; the hashed exchange is O(16 B/position).
The top-gram tie-break is therefore gram-blind: ties in count resolve to
the maximal char contribution ``count * length``, under which any
remaining tie emits the identical fraction either way.

NOTE on paper fidelity: Rae et al. define ``dup_{n}_frac`` over
CHARACTERS; the default ``dup_{n}_frac`` here measures the fraction of
token POSITIONS covered by duplicated n-grams (position union).  The two
agree exactly when token lengths are uniform and track each other
closely otherwise; thresholds tuned on the paper's character fractions
are approximate operating points for the position form.  For
paper-equivalent operating points, ``dup_char_ns`` emits
``dup_{n}_frac_chars``: the CHARACTER union — each covered token
position weighted by its char length, plus every inter-token space some
single duplicated occurrence spans (a space between p and p+1 counts
iff one occurrence contains BOTH, not merely each side covered by
different occurrences) — over ``length(text)``.  Under the
single-space tokenization contract this is exactly the paper's measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.util import ensure_min_parallelism


def _occurrences(df: DataFrame, id_col: str, text_col: str, ns: list[int]) -> DataFrame:
    """(id, n, i, gh, gl, m, chars): every n-gram occurrence for every
    requested n, keyed by the gram's 64-bit hash ``gh`` and char length
    ``gl`` — the string itself is materialized and dropped inside the scan
    stage, so downstream shuffles exchange 12 bytes per occurrence, never
    the concatenated gram."""
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
    g = F.concat_ws(" ", F.slice("toks", F.col("i") + 1, F.col("n")))
    return (
        with_n.select(
            "id", "m", "chars", "n", "toks",
            F.explode(F.sequence(F.lit(0), F.col("m") - F.col("n"))).alias("i"),
        )
        .select(
            "id", "m", "chars", "n", "i",
            F.xxhash64(F.lit("rep|"), g).alias("gh"),
            F.length(g).alias("gl"),
        )
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: list[int] = (2, 3),
    dup_ns: list[int] = (5, 10),
    dup_char_ns: list[int] = (),
) -> DataFrame:
    """One row per document: ``top_{n}_frac`` for each n in ``top_ns``,
    ``dup_{n}_frac`` for each n in ``dup_ns``, and ``dup_{n}_frac_chars``
    for each n in ``dup_char_ns`` (column order: top, dup, dup-chars,
    each ascending n), plus ``n_tokens``.  Documents shorter than n tokens
    score 0.0 for that signal.  Deterministic: count ties on the top
    n-gram resolve to the maximal char contribution count*length (any
    deeper tie emits the identical fraction), every fraction is one exact
    integer division rounded to 4 decimals (+0.0 normalizes any -0.0).

    ``dup_char_ns`` (each n ≥ 2) is the module-docstring character
    variant — Rae et al.'s own units.  It adds one (id, p)-keyed join
    against the per-position token lengths and a space-slot union; the
    shuffle still never carries gram strings.
    """
    if any(n < 2 for n in dup_char_ns):
        raise ValueError(
            "repetition_signals: dup_char_ns entries must be >= 2 "
            f"(got {sorted(dup_char_ns)!r}) — a 1-gram spans no inter-"
            "token space and its char fraction is the position fraction"
        )
    ns = sorted(set(list(top_ns) + list(dup_ns) + list(dup_char_ns)))
    occ = _occurrences(df, id_col, text_col, list(ns))

    # --- top-frequency n-gram, char fraction ---
    # Grouped on the gram HASH (12-byte shuffle rows); the winner is the
    # lexicographic max of struct(count, count*len) — a plain aggregate,
    # no window sort over the gram relation.
    #
    # NOTE (round-11 optimization audit): deriving cnt from the dup
    # branch's (id, n, gh) count window — so both branches share one
    # occurrence exchange — was tried and REVERTED: per-branch column
    # pruning keeps the two exchange subtrees non-identical (top needs
    # gl/chars, dup needs m/i), so reuse never fires, and the counts
    # branch additionally pays the window's full occurrence sort that the
    # map-side-partial groupBy avoids (measured +30% on
    # doc_gopher_rep_fracs at sf0.1).  Two passes over the occurrence
    # stream is the honest floor for this pair of signals.
    cnt = occ.groupBy("id", "n", "gh").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("gl").alias("gl"),
        F.max("chars").alias("chars"),
    )
    top = (
        cnt.groupBy("id", "n")
        .agg(
            F.max(
                F.struct(
                    F.col("c").alias("c"),
                    (F.col("c") * F.col("gl")).alias("tc"),
                )
            ).alias("__mx"),
            F.max("chars").alias("chars"),
        )
        .select("id", "n", F.col("__mx.tc").alias("top_chars"), "chars")
    )

    # --- duplicated n-gram occurrences (shared by both dup measures) ---
    dup_occ = occ.withColumn(
        "__c", F.count(F.lit(1)).over(Window.partitionBy("id", "n", "gh"))
    ).where(F.col("__c") >= 2)

    # token-position union
    dup_cover = (
        dup_occ.select(
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
    out = base
    if top_ns:
        top_agg = [
            F.coalesce(
                F.max(F.when(F.col("n") == n, frac4(F.col("top_chars"), F.col("chars")))),
                F.lit(0.0),
            ).alias(f"top_{n}_frac")
            for n in sorted(top_ns)
        ]
        out = out.join(top.groupBy("id").agg(*top_agg), "id", "left")
    if dup_ns:
        dup_agg = [
            F.coalesce(
                F.max(F.when(F.col("n") == n, frac4(F.col("covered"), F.col("m")))),
                F.lit(0.0),
            ).alias(f"dup_{n}_frac")
            for n in sorted(dup_ns)
        ]
        out = out.join(dup_cover.groupBy("id").agg(*dup_agg), "id", "left")

    if dup_char_ns:
        # character union: char-weight the covered token positions via one
        # (id, p)-keyed join against per-position token lengths, then add
        # the inter-token spaces a single occurrence spans (space slot s
        # sits between tokens s and s+1; an occurrence at (i, n) spans
        # slots i .. i+n-2) — union'd separately so a slot whose two
        # neighbors are covered by DIFFERENT occurrences is not counted.
        tok_lens = df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), " ")).alias("p", "__tok"),
        ).select("id", "p", F.length("__tok").alias("tl"))
        char_occ = dup_occ.where(F.col("n").isin([int(n) for n in dup_char_ns]))
        tok_cov = (
            char_occ.select(
                "id", "n", "chars",
                F.explode(F.sequence(F.col("i"), F.col("i") + F.col("n") - 1)).alias("p"),
            )
            .groupBy("id", "n", "p")
            .agg(F.max("chars").alias("chars"))
            .join(tok_lens, ["id", "p"])
            .groupBy("id", "n")
            .agg(F.sum("tl").alias("tok_chars"), F.max("chars").alias("chars"))
        )
        space_cov = (
            char_occ.select(
                "id", "n",
                F.explode(F.sequence(F.col("i"), F.col("i") + F.col("n") - 2)).alias("s"),
            )
            .groupBy("id", "n")
            .agg(F.count_distinct("s").alias("n_spaces"))
        )
        # inner join is lossless: every (id, n) with any duplicated
        # occurrence has both relations (n >= 2 guarantees >= 1 space slot)
        char_fracs = tok_cov.join(space_cov, ["id", "n"])
        char_agg = [
            F.coalesce(
                F.max(
                    F.when(
                        F.col("n") == n,
                        frac4(F.col("tok_chars") + F.col("n_spaces"), F.col("chars")),
                    )
                ),
                F.lit(0.0),
            ).alias(f"dup_{n}_frac_chars")
            for n in sorted(dup_char_ns)
        ]
        out = out.join(char_fracs.groupBy("id").agg(*char_agg), "id", "left")

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
        + [
            F.coalesce(f"dup_{n}_frac_chars", F.lit(0.0)).alias(f"dup_{n}_frac_chars")
            for n in sorted(dup_char_ns)
        ]
    )
    return out.select(*cols)
