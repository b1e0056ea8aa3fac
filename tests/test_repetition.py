"""Gopher repetition signals: hand-computed fractions, overlap
(position-union) semantics, short-doc zeros, determinism of the top-gram
tiebreak."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.operators.repetition import (
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _one(df, doc_id):
    return {r["doc_id"]: r.asDict() for r in df.collect()}[doc_id]


def test_top_ngram_char_fraction_hand_computed(spark):
    # "ab cd ab cd ab" -> 2-grams: "ab cd" x2, "cd ab" x2 -> top tie breaks
    # lexicographically to "ab cd" (len 5), count 2 -> 10/14 chars
    d = _docs(spark, [(1, "ab cd ab cd ab")])
    r = _one(repetition_signals(d, top_ns=[2], dup_ns=[5]), 1)
    assert r["n_tokens"] == 5
    assert r["top_2_frac"] == round(2 * 5 / 14, 4)
    assert r["dup_5_frac"] == 0.0  # only one 5-gram -> nothing duplicated


def test_dup_ngram_union_does_not_double_count_overlaps(spark):
    # 8 tokens "x x x x x x y z": 5-gram "x x x x x" occurs at i=0 and i=1
    # (duplicated); union of covered positions = {0..5} -> 6/8
    d = _docs(spark, [(1, "x x x x x x y z")])
    r = _one(repetition_signals(d, top_ns=[2], dup_ns=[5]), 1)
    assert r["dup_5_frac"] == round(6 / 8, 4)


def test_short_docs_and_unique_docs_score_zero(spark):
    d = _docs(
        spark,
        [
            (1, "only three tokens"),  # shorter than every dup n
            (2, "a b c d e f g h i j"),  # all n-grams unique
        ],
    )
    out = repetition_signals(d, top_ns=[2], dup_ns=[5, 10])
    r1, r2 = _one(out, 1), _one(out, 2)
    assert r1["dup_5_frac"] == 0.0 and r1["dup_10_frac"] == 0.0
    assert r2["dup_5_frac"] == 0.0 and r2["dup_10_frac"] == 0.0
    # unique 2-grams: top count 1 -> its chars / total chars; count ties
    # resolve to the max char contribution ("three tokens", len 12)
    assert r2["top_2_frac"] == round(3 / 19, 4)
    assert r1["top_2_frac"] == round(len("three tokens") / len("only three tokens"), 4)


def test_row_count_and_schema(spark):
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = repetition_signals(d)
    assert out.columns == [
        "doc_id", "n_tokens", "top_2_frac", "top_3_frac",
        "dup_5_frac", "dup_10_frac",
    ]
    assert out.count() == d.count()


def test_dup_char_fraction_hand_computed(spark):
    """Paper-unit character fraction: tokens char-weighted plus the inner
    spaces an occurrence spans.  "ab cd ab cd x": dup 2-gram "ab cd" at
    positions 0 and 2 covers tokens {0,1,2,3} (8 chars) and space slots
    {0,2} (2 chars) over 13 text chars -> 10/13; the position form says
    4/5 — the two units genuinely differ on this doc."""
    d = _docs(spark, [(1, "ab cd ab cd x")])
    r = _one(
        repetition_signals(d, top_ns=[], dup_ns=[2], dup_char_ns=[2]), 1
    )
    assert r["dup_2_frac"] == round(4 / 5, 4)
    assert r["dup_2_frac_chars"] == round(10 / 13, 4)


def test_dup_char_fraction_space_needs_single_spanning_occurrence(spark):
    """A space whose two neighbor tokens are covered by DIFFERENT
    duplicated occurrences is NOT covered: "x y x y" -> "x y" at 0 and 2
    covers all four tokens, but slot 1 (between the two occurrences) is
    spanned by no duplicated occurrence -> 6/7, not 7/7."""
    d = _docs(spark, [(1, "x y x y")])
    r = _one(repetition_signals(d, top_ns=[], dup_ns=[], dup_char_ns=[2]), 1)
    assert r["dup_2_frac_chars"] == round(6 / 7, 4)


def test_dup_char_ns_rejects_unigrams(spark):
    import pytest

    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="dup_char_ns"):
        repetition_signals(d, dup_char_ns=[1])
