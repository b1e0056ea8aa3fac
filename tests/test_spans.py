"""Duplicated-span detection: planted-passage recovery, maximality,
alignment separation, the df cap's observable lossiness, and the
excision report's interval-merge arithmetic."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.operators import spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _span_rows(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["a_start"], r["b_start"], r["span_len"])
        for r in df.collect()
    )


def test_planted_passage_exact_coordinates(spark):
    """A 10-token passage pasted at different offsets in two docs comes
    back as ONE maximal span with exact 1-based coordinates."""
    passage = " ".join(f"p{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (1, "a1 a2 a3 " + passage + " a4 a5"),
            (2, "b1 " + passage + " b2 b3 b4 b5 b6"),
        ],
    )
    got = _span_rows(
        spans.duplicated_span_pairs(d, "doc_id", "text", 3, min_len=8)
    )
    assert got == [(1, 2, 4, 2, 10)]


def test_maximality_no_fragment_rows(spark):
    """A k-shingle run of a long passage must merge into one row — never
    one row per matching shingle."""
    passage = " ".join(f"w{i}" for i in range(20))
    d = _docs(spark, [(1, passage + " x1 x2"), (2, "y1 y2 y3 " + passage)])
    got = _span_rows(
        spans.duplicated_span_pairs(d, "doc_id", "text", 3, min_len=8)
    )
    assert got == [(1, 2, 1, 4, 20)]


def test_two_alignments_two_rows(spark):
    """The same passage repeated TWICE in one doc matches an earlier
    single occurrence at two alignments — two rows, one per repeat."""
    p = " ".join(f"q{i}" for i in range(8))
    d = _docs(spark, [(1, p), (2, p + " gap1 gap2 " + p)])
    got = _span_rows(
        spans.duplicated_span_pairs(d, "doc_id", "text", 3, min_len=8)
    )
    assert got == [(1, 2, 1, 1, 8), (1, 2, 1, 11, 8)]


def test_below_min_len_dropped(spark):
    p = " ".join(f"s{i}" for i in range(6))
    d = _docs(spark, [(1, p + " a b c"), (2, "d e f " + p)])
    out = spans.duplicated_span_pairs(d, "doc_id", "text", 3, min_len=8)
    assert out.count() == 0


def test_max_df_cap_drops_boilerplate(spark):
    """A passage shared by MORE than max_df docs is (documented-lossy)
    dropped; one shared by fewer survives."""
    p = " ".join(f"c{i}" for i in range(10))
    rows = [(i, f"u{i} " + p) for i in range(1, 12)]  # 11 docs share it
    d = _docs(spark, rows)
    # 11 docs x 8 postings per 3-shingle of a 10-token passage => df=11
    lossy = spans.duplicated_span_pairs(
        d, "doc_id", "text", 3, min_len=8, max_postings=10
    )
    assert lossy.count() == 0
    full = spans.duplicated_span_pairs(
        d, "doc_id", "text", 3, min_len=8, max_postings=11
    )
    assert full.count() == 55  # all C(11,2) pairs


def test_excision_merges_overlapping_intervals(spark):
    """Two overlapping flagged spans in one doc count their UNION of
    tokens, not the sum."""
    a = " ".join(f"a{i}" for i in range(12))  # doc 1: tokens 1..12
    b = " ".join(f"a{i}" for i in range(8))  # prefix, tokens 1..8
    c = " ".join(f"a{i}" for i in range(4, 12))  # suffix, tokens 5..12
    # doc 3 contains BOTH the prefix (at 1..8) and suffix (at 9..16 of its
    # own coordinates) => two spans vs doc1 overlapping? Construct doc3 as
    # the full 12-token sequence so spans vs doc1 (1..12) and vs doc2
    # (1..8) and vs docC (5..12) overlap inside doc3.
    d = _docs(spark, [(1, a), (2, b), (3, c), (4, a + " z1 z2")])
    rep = {
        r["doc_id"]: r
        for r in spans.span_excision_report(
            d, "doc_id", "text", 3, min_len=8
        ).collect()
    }
    # doc 4 repeats doc1's full 12 tokens, doc2's 8-prefix, doc3's 8-suffix:
    # merged interval is 1..12 => 12 tokens flagged of its 14.
    assert rep[4]["tokens_flagged"] == 12
    assert rep[4]["n_spans"] == 1
    assert rep[4]["doc_tokens"] == 14
    assert abs(rep[4]["retention_pct"] - round(100.0 * 2 / 14, 2)) < 1e-9
    # doc 3 (suffix) repeats doc1[5..12] and doc2 only overlaps 4 tokens
    # (below min_len) => one span of 8, flagged 8 of 8.
    assert rep[3]["tokens_flagged"] == 8
    # doc 1 is the FIRST occurrence — never flagged.
    assert 1 not in rep


def test_excision_disjoint_intervals_sum(spark):
    p1 = " ".join(f"m{i}" for i in range(8))
    p2 = " ".join(f"n{i}" for i in range(8))
    d = _docs(
        spark,
        [(1, p1), (2, p2), (3, p1 + " mid1 mid2 mid3 " + p2)],
    )
    rep = {
        r["doc_id"]: r
        for r in spans.span_excision_report(
            d, "doc_id", "text", 3, min_len=8
        ).collect()
    }
    assert rep[3]["n_spans"] == 2
    assert rep[3]["tokens_flagged"] == 16
    assert rep[3]["doc_tokens"] == 19


def test_rewrite_removes_flagged_and_drops_full_copies(spark):
    import hashlib

    a = " ".join(f"a{i}" for i in range(12))
    d = _docs(
        spark,
        [
            (1, a),                      # first occurrence — untouched
            (2, a),                      # whole-doc copy — fully excised
            (3, a + " z1 z2"),           # copy + 2 own tokens
            (4, "q1 q2 q3 q4"),          # no dups — passes through whole
        ],
    )
    out = {
        r["doc_id"]: r
        for r in spans.span_excised_corpus(
            d, "doc_id", "text", 3, min_len=8
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["kept_tokens"] == 12 and out[1]["rebuilt_md5"] == md5(a)
    assert 2 not in out  # total-overlap case: excised to nothing
    assert out[3]["kept_tokens"] == 2 and out[3]["rebuilt_md5"] == md5("z1 z2")
    assert out[4]["kept_tokens"] == 4
    assert out[4]["rebuilt_md5"] == md5("q1 q2 q3 q4")


def test_cap_audit_counts(spark):
    p = " ".join(f"c{i}" for i in range(5))  # 3 shingles per occurrence
    d = _docs(spark, [(1, p), (2, p), (3, p), (4, "x y z w v")])
    row = spans.span_df_cap_audit(
        d, "doc_id", "text", shingle_n=3, max_postings=2
    ).collect()[0]
    # 3 distinct passage shingles (df=3 > cap) + 3 unique doc-4 shingles
    assert row["distinct_shingles"] == 6
    assert row["postings"] == 12
    assert row["capped_shingles"] == 3
    assert row["capped_postings"] == 9
    assert row["pair_expansion"] == 0  # df=1 shingles are below the >=2 band


# --- sorted-neighborhood (SNM) near-dup: lives here with the other
# planted-fixture dedup tests ---


def test_snm_finds_adjacent_near_dups(spark):
    from oltp_to_data_warehouse_pipeline_spark.operators import dedup

    base = " ".join(f"t{i}" for i in range(30))
    d = _docs(
        spark,
        [
            (1, base),
            (2, base + " extra1"),  # near-dup of 1
            (3, " ".join(f"z{i}" for i in range(30))),  # unrelated
        ],
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", window=2, threshold=0.5
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] > 0.9
    assert all(3 not in pair for pair in got)


def test_snm_precision_one_vs_exact_jaccard(spark):
    """Every SNM pair must also appear in the all-candidates exact
    Jaccard join at the same threshold, with the same score — precision 1
    by construction (the window only limits RECALL)."""
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table
    from oltp_to_data_warehouse_pipeline_spark.operators import dedup

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    snm = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", window=16, threshold=0.5
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 4)
        for r in dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", shingle_n=3, threshold=0.5
        ).collect()
    }
    assert snm, "fixture must produce SNM pairs or the test is vacuous"
    for pair, j in snm.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-9, pair


def test_snm_window_miss_is_the_documented_trade(spark):
    """Three identical docs with window=1: the rank-adjacent pairs are
    found, the rank-distance-2 pair is missed — the SNM recall trade."""
    from oltp_to_data_warehouse_pipeline_spark.operators import dedup

    t = " ".join(f"w{i}" for i in range(20))
    d = _docs(spark, [(1, t), (2, t), (3, t)])
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", window=1, threshold=0.5
        ).collect()
    )
    assert got == [(1, 2), (2, 3)]  # (1, 3) missed by design
    wide = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", window=2, threshold=0.5
        ).collect()
    )
    assert wide == [(1, 2), (1, 3), (2, 3)]


def test_snm_null_text_gets_fingerprint_zero_and_no_pairs(spark):
    """NULL-text docs must rank with fingerprint 0 (the value a per-bit
    CASE oracle naturally computes) instead of a NULLS-FIRST NULL, and
    their candidate pairs must be dropped in verification — the oracle's
    shingle unnest emits no rows for them, so the inner join eliminates
    their pairs.  Round-8 advisor finding (latent on NULL-free fixtures)."""
    from oltp_to_data_warehouse_pipeline_spark.operators import dedup

    t = " ".join(f"w{i}" for i in range(20))
    d = _docs(spark, [(1, t), (2, t), (3, None), (4, None)])
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in dedup.sorted_neighborhood_pairs(
            d, "doc_id", "text", window=3, threshold=0.5
        ).collect()
    )
    # window=3 makes every doc a candidate neighbor of every other; only
    # the real near-dup pair survives — never a NULL–NULL "jaccard 1.0".
    assert got == [(1, 2)]
