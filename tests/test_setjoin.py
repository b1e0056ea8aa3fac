"""Prefix-filter set-similarity join: losslessness vs the plain
inverted-index join across thresholds, real pruning, and the audit's
internal consistency."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
from oltp_to_data_warehouse_pipeline_spark.operators import dedup, setjoin

SF = "/root/testdata/sf0.001"


def _pairs(df_result):
    return sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in df_result.collect()
    )


def test_lossless_across_thresholds(spark):
    """The prefix theorem's whole claim: for any tau the filtered join
    returns EXACTLY the pairs the all-pairs formulation does."""
    d = load_table(spark, SF, "documents")
    for tau in (0.3, 0.5, 0.8):
        got = _pairs(setjoin.prefix_filter_pairs(d, "doc_id", "text", 3, tau))
        want = _pairs(dedup.ngram_jaccard_pairs(d, "doc_id", "text", 3, tau))
        assert got == want, f"tau={tau}"
        assert got, f"tau={tau}: fixture must produce pairs or the test is vacuous"


def test_prefix_actually_prunes(spark):
    d = load_table(spark, SF, "documents")
    audit = setjoin.prefix_filter_audit(d, "doc_id", "text", 3, 0.5).collect()[0]
    assert audit["postings_prefix"] < audit["postings_all"]
    # with tau=0.5 the prefix keeps about half of each doc's shingles
    assert audit["postings_prefix"] <= 0.6 * audit["postings_all"]
    assert audit["n_candidates"] >= audit["n_pairs"]


def test_higher_tau_shorter_prefix(spark):
    d = load_table(spark, SF, "documents")
    lo = setjoin.prefix_filter_audit(d, "doc_id", "text", 3, 0.3).collect()[0]
    hi = setjoin.prefix_filter_audit(d, "doc_id", "text", 3, 0.8).collect()[0]
    assert hi["postings_prefix"] < lo["postings_prefix"]
    assert hi["n_candidates"] <= lo["n_candidates"]


def test_crafted_edge_pair_survives(spark):
    """A pair sharing exactly its rarest shingle region — the case a
    broken prefix order silently drops."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "one two three four five six"),
    ]
    d = spark.createDataFrame(rows, "doc_id int, text string")
    got = _pairs(setjoin.prefix_filter_pairs(d, "doc_id", "text", 3, 0.5))
    want = _pairs(dedup.ngram_jaccard_pairs(d, "doc_id", "text", 3, 0.5))
    assert got == want
    assert [(a, b) for a, b, _ in got] == [(1, 2)]


def test_prefix_ceiling_is_exact_integer(spark):
    """ceil(tau*n) must be the RATIONAL ceiling: IEEE 0.55*100 =
    55.000000000000007, so a float ceil admits a prefix one posting short
    of the theorem's bound (a silently lost qualifying pair — the
    losslessness guarantee).  With n=100 distinct shingles and tau=0.55
    the prefix must hold exactly 100 - 55 + 1 = 46 postings."""
    from oltp_to_data_warehouse_pipeline_spark.operators import setjoin

    words = " ".join(f"w{i:03d}" for i in range(102))  # 100 distinct 3-grams
    df = spark.createDataFrame([(1, words)], "doc_id int, text string")
    tok = setjoin._tokens(df, "doc_id", "text", 3)
    assert tok.count() == 100
    assert setjoin._prefix(tok, 0.55).count() == 46


def test_threshold_fraction_exact_rationals():
    from oltp_to_data_warehouse_pipeline_spark.operators import setjoin

    assert setjoin.threshold_fraction(0.8) == (4, 5)
    assert setjoin.threshold_fraction(0.55) == (11, 20)
    assert setjoin.threshold_fraction(0.5) == (1, 2)
