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
