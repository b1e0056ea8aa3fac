"""Text-analysis expressions: tokenization, quality, language ID, prints."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.functions import text


def _val(spark, s: str, expr_builder):
    df = spark.createDataFrame([(s,)], ["t"])
    return df.select(expr_builder("t").alias("v")).first()["v"]


def test_token_count(spark):
    assert _val(spark, "a b  c", text.token_count) == 3  # regex split handles runs
    assert _val(spark, "one", text.token_count) == 1


def test_bpe_ish_token_count(spark):
    # 2 words, 11 chars -> ceil((2 + 11/4)/2) = ceil(2.375) = 3
    assert _val(spark, "hello world", text.bpe_ish_token_count) == 3


def test_stopword_ratio(spark):
    assert _val(spark, "the cat and the dog", text.stopword_ratio) == 0.6


def test_avg_token_len(spark):
    assert _val(spark, "ab cd", text.avg_token_len) == 2.0


def test_quality_score_range(spark):
    long_good = "the quick brown fox jumps over the lazy dog and runs to the hills"
    assert _val(spark, long_good, text.quality_score) == 1.0
    assert _val(spark, "x", text.quality_score) == 0.0


def test_lang_guess(spark):
    assert _val(spark, "the cat is in the house and of note", text.lang_guess) == "en"
    assert _val(spark, "der hund ist ein tier und das haus", text.lang_guess) == "de"
    assert _val(spark, "le chat est un animal et les chiens", text.lang_guess) == "fr"
    assert _val(spark, "qqq www zzz", text.lang_guess) == "und"


def test_fingerprints(spark):
    a = _val(spark, "Hello  World", text.normalized_fingerprint)
    b = _val(spark, "hello world", text.normalized_fingerprint)
    assert a == b
    assert _val(spark, "x", text.fingerprint) != _val(spark, "y", text.fingerprint)


def test_winnowing_shared_substring_guarantee(spark):
    from oltp_to_data_warehouse_pipeline_spark.functions.text import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"AAAA {shared} BBBB"),
        (2, f"zzz 123 {shared} qqq 456"),
        (3, "completely unrelated content with no overlap at all xyzw"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    fps = winnowing_fingerprints(df, "doc_id", "text", k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # winnowing guarantee: a shared substring of length >= w+k-1 (8) chars
    # must contribute at least one common fingerprint
    assert by_doc[1] & by_doc[2]
    # sanity: selection prunes (fewer fps than grams) and dedupes
    assert 0 < len(by_doc[1]) < len(rows[0][1]) - 4
    # unrelated doc shares nothing with doc 1 beyond chance; require
    # strictly smaller overlap than the true-overlap pair
    assert len(by_doc[1] & by_doc[3]) < len(by_doc[1] & by_doc[2])


def test_winnowing_identical_docs_identical_fps(spark):
    from oltp_to_data_warehouse_pipeline_spark.functions.text import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, "Some Document   Text"), (2, "some document text")],
        "doc_id: long, text: string",
    )
    fps = winnowing_fingerprints(df, "doc_id", "text").collect()
    a = {r["fp"] for r in fps if r["doc_id"] == 1}
    b = {r["fp"] for r in fps if r["doc_id"] == 2}
    # normalization (case + whitespace collapse) makes them identical
    assert a == b and a


def test_tokenizer_engine_parity_on_messy_whitespace(spark):
    """tokens() must agree with its documented SQL twin on tabs, newlines,
    and doubled spaces — the trap that single-space string_split falls into."""
    import duckdb

    from oltp_to_data_warehouse_pipeline_spark.functions.text import (
        avg_token_len,
        token_count,
    )

    samples = [
        "a\tb  c",
        "  leading and trailing  ",
        "line\nbreaks\r\nhere",
        "single",
        "a  b",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text: string")
    got = [
        (r["n"], round(r["atl"], 4))
        for r in df.select(
            token_count("text").alias("n"), avg_token_len("text").alias("atl")
        ).collect()
    ]
    con = duckdb.connect()
    want = []
    for s in samples:
        n, atl = con.execute(
            r"""
            SELECT len(string_split(regexp_replace(trim(?), '\s+', ' ', 'g'), ' ')),
                   round(length(regexp_replace(?, '\s+', '', 'g')) /
                         greatest(len(string_split(regexp_replace(trim(?), '\s+', ' ', 'g'), ' ')), 1), 4)
            """,
            [s, s, s],
        ).fetchone()
        want.append((n, atl))
    assert got == want


def test_word_ngrams_edges(spark):
    from oltp_to_data_warehouse_pipeline_spark.functions.text import tokens, word_ngrams

    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("a",), ("",), ("  a   b  ",)], "text: string"
    )
    out = df.select(
        word_ngrams(tokens("text"), 2).alias("b"),
        word_ngrams(tokens("text"), 3).alias("t"),
    ).collect()
    assert out[0]["b"] == ["a b", "b c", "c d"] and out[0]["t"] == ["a b c", "b c d"]
    assert out[1]["b"] == ["a b"] and out[1]["t"] == []
    assert out[2]["b"] == [] and out[2]["t"] == []
    assert out[3]["b"] == [] and out[3]["t"] == []  # '' tokenizes to ['']
    assert out[4]["b"] == ["a b"], "whitespace collapses before n-gramming"


def test_shingle_hashes_match_manual_md5(spark):
    import hashlib

    from oltp_to_data_warehouse_pipeline_spark.functions.text import shingle_hashes

    df = spark.createDataFrame([("x y z w",)], "text: string")
    got = df.select(shingle_hashes("text", 3).alias("s")).collect()[0]["s"]
    want = [
        hashlib.md5(b"x y z").hexdigest(),
        hashlib.md5(b"y z w").hexdigest(),
    ]
    assert got == want


def test_pii_scrub_families_and_order(spark):
    from oltp_to_data_warehouse_pipeline_spark.functions.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@ex-ample.co.uk now",),
            ("server at 10.0.255.3 port 80",),
            ("call +1-555-0123456 or 5550123456",),
            ("clean text, no identifiers here",),
            ("pair: a@b.io from 192.168.0.1",),
        ],
        "text: string",
    )
    rows = df.select(pii_scrub("text").alias("s"), *pii_counts("text")).collect()
    assert rows[0]["s"] == "mail <EMAIL> now" and rows[0]["n_email"] == 1
    assert rows[1]["s"] == "server at <IP> port 80" and rows[1]["n_ip"] == 1
    assert rows[2]["s"] == "call <PHONE> or <PHONE>" and rows[2]["n_phone"] == 2
    assert rows[3]["s"] == rows[3][0] and rows[3]["n_email"] == 0
    assert rows[4]["s"] == "pair: <EMAIL> from <IP>"


def test_chunk_spans_cover_and_overlap(spark):
    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.functions.text import chunk_spans, tokens

    df = spark.createDataFrame(
        [("w " * 100).strip()] + ["short text", ""], "string"
    ).toDF("text")
    out = (
        df.withColumn("__toks", tokens("text"))
        .select(F.size("__toks").alias("n"), chunk_spans(F.col("__toks"), 10, 4).alias("c"))
        .collect()
    )
    # 100 tokens, size 10, stride 6: ceil((100-4)/6) = 16 chunks
    spans = out[0]["c"]
    assert len(spans) == 16
    assert spans[0]["tok_start"] == 0 and spans[0]["tok_end"] == 10
    assert spans[1]["tok_start"] == 6, "stride = size - overlap"
    assert spans[-1]["tok_end"] == 100, "final chunk clipped to n"
    assert all(s["tok_end"] - s["tok_start"] <= 10 for s in spans)
    # every token index is covered by at least one span
    covered = set()
    for s in spans:
        covered.update(range(s["tok_start"], s["tok_end"]))
    assert covered == set(range(100))
    # short docs -> exactly one whole-range chunk
    assert [dict(s.asDict()) for s in out[1]["c"]] == [
        {"chunk_idx": 0, "tok_start": 0, "tok_end": 2}
    ]
    assert out[2]["c"][0]["tok_end"] == out[2]["n"]


def test_chunk_spans_rejects_bad_overlap():
    import pytest
    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.functions.text import chunk_spans

    with pytest.raises(ValueError, match="overlap"):
        chunk_spans(F.col("x"), size=8, overlap=8)


def test_char_entropy_known_values(spark):
    import math

    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("abcd",), ("ab ab",), ("",), ("AaAa",)], "text: string"
    )
    got = [r["h"] for r in df.select(F.round(char_entropy("text"), 6).alias("h")).collect()]
    assert got[0] == 0.0, "single-symbol runs carry no information"
    assert got[1] == 2.0, "uniform 4-symbol alphabet = 2 bits"
    # 'ab ab': counts a:2 b:2 space:1 over N=5
    want = round(math.log2(5) - (2 * math.log2(2) + 2 * math.log2(2)) / 5, 6)
    assert got[2] == want
    assert got[3] == 0.0, "empty text guards to 0"
    assert got[4] == 0.0, "entropy is over NORMALIZED (lowercased) text"


def test_char_entropy_scorer_matches_expression(spark):
    """The Arrow-batched scorer and the pure-expression fold are the same
    function — per-doc equality at 1e-9, including unicode and empties."""
    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.functions.text import (
        char_entropy,
        char_entropy_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "aaaa bbbb aaaa bbbb"),
            (3, ""),
            (4, "  MiXeD   CaSe\tand\nnewlines  "),
            (5, "digits 012 345 678 9 and punct !?.,;:"),
            (6, "\tleading tab survives trim but collapses to a space"),
            (7, "trailing newline too\n"),
        ],
        "doc_id: long, text: string",
    )
    expr = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", char_entropy("text").alias("h")).collect()
    }
    scored = {
        r["doc_id"]: (r["entropy_raw"], r["n_chars_norm"], r["n_distinct_chars"])
        for r in char_entropy_stats(df).collect()
    }
    for k, h in expr.items():
        assert abs(scored[k][0] - h) < 1e-9, f"doc {k}: {scored[k][0]} != {h}"
    assert scored[3][1] == 1 and scored[3][0] == 0.0


def test_chunk_spans_properties(spark):
    """Property check across the (n, size, overlap) grid: spans tile the
    token range with the promised stride, clip only at the end, and cover
    every index exactly once per non-overlap position."""
    from pyspark.sql import functions as F

    from oltp_to_data_warehouse_pipeline_spark.functions.text import chunk_spans

    cases = [
        (n, size, overlap)
        for n in (1, 5, 9, 10, 11, 64, 65, 200)
        for (size, overlap) in ((10, 4), (10, 0), (64, 16), (8, 7))
    ]
    df = spark.createDataFrame(
        [(n, size, ov, "w " * n) for n, size, ov in cases],
        "n: int, size: int, ov: int, text: string",
    )
    for size, ov in {(s, o) for _, s, o in cases}:
        rows = (
            df.where((F.col("size") == size) & (F.col("ov") == ov))
            .select("n", chunk_spans(F.split(F.trim("text"), " "), size, ov).alias("c"))
            .collect()
        )
        stride = size - ov
        for r in rows:
            n, spans = r["n"], r["c"]
            assert spans[0]["tok_start"] == 0
            assert spans[-1]["tok_end"] == n, (n, size, ov)
            for i, s in enumerate(spans):
                assert s["chunk_idx"] == i
                assert s["tok_start"] == i * stride
                assert s["tok_end"] == min(i * stride + size, n)
            covered = {t for s in spans for t in range(s["tok_start"], s["tok_end"])}
            assert covered == set(range(n)), (n, size, ov)
            # no fully-redundant trailing chunk: every chunk starts within range
            assert all(s["tok_start"] < n for s in spans), (n, size, ov)
