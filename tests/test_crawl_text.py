"""Crawl-ingest helpers: URL canonicalization and HTML text extraction —
the two scan-stage transforms between a WARC response and a `documents`
row."""

from __future__ import annotations

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.functions import text as text_fns


def _one(spark, fn, value: str) -> str:
    return spark.range(1).select(fn(F.lit(value)).alias("v")).first()["v"]


def test_canonical_url_collapses_common_aliases(spark):
    cases = {
        # tracking params stripped, query healed
        "https://Example.COM/a?utm_source=x&id=3&utm_campaign=y": "https://example.com/a?id=3",
        "https://example.com/a?utm_source=x": "https://example.com/a",
        "https://example.com/a?fbclid=abc&b=2": "https://example.com/a?b=2",
        # fragment gone
        "https://example.com/a#section-2": "https://example.com/a",
        # host lowercased, path case preserved
        "HTTPS://WWW.Example.com/Path/To": "https://www.example.com/Path/To",
        # duplicate slashes and trailing slash
        "https://example.com//a///b/": "https://example.com/a/b",
        # both root spellings collapse to the slashless key
        "https://example.com/": "https://example.com",
        "https://example.com": "https://example.com",
        # scheme-less strings pass through mostly untouched
        "not a url": "not a url",
    }
    for raw, want in cases.items():
        assert _one(spark, text_fns.canonical_url, raw) == want, raw


def test_canonical_url_is_idempotent(spark):
    raw = "https://Example.com//x/?utm_source=a&q=1#frag"
    once = _one(spark, text_fns.canonical_url, raw)
    twice = _one(spark, text_fns.canonical_url, once)
    assert once == twice == "https://example.com/x?q=1"


def test_html_to_text_strips_markup_and_decodes(spark):
    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><!-- note --><script>var x=1;</script>"
        "<h1>Header</h1><p>alpha &amp; beta</p><div>gamma&nbsp;delta</div>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    got = _one(spark, text_fns.html_to_text, html)
    assert got == "Header alpha & beta gamma delta one two"
    # head/script/style/comments contribute nothing
    assert "color" not in got and "var x" not in got and "note" not in got and "T" != got[0]


def test_html_block_tags_separate_words(spark):
    got = _one(spark, text_fns.html_to_text, "<p>one</p><p>two</p>three<br>four")
    assert got == "one two three four"


def test_warc_to_documents_with_extraction(spark, tmp_path):
    """The crawl-ingest composition with real extraction: WARC response →
    html_to_text payload + canonical_url key → dedup on (url, text
    fingerprint) collapses the tracking-param mirror."""
    from oltp_to_data_warehouse_pipeline_spark.sources.warc import (
        WarcDataSource,
        write_warc,
    )

    recs = [
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:p1>",
            "target_uri": "https://Example.com/story?utm_source=feed",
            "payload": b"<html><body><p>breaking &amp; news</p></body></html>",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:p2>",
            "target_uri": "https://example.com/story",  # same page, no tracking
            "payload": b"<html><body><p>breaking &amp;\nnews</p></body></html>",
        },
    ]
    p = str(tmp_path / "seg.warc")
    write_warc(recs, p)
    spark.dataSource.register(WarcDataSource)
    docs = (
        spark.read.format("warc")
        .load(p)
        .select(
            text_fns.canonical_url(F.col("target_uri")).alias("url"),
            text_fns.html_to_text(F.col("payload").cast("string")).alias("text"),
        )
    )
    rows = docs.collect()
    assert all(r["url"] == "https://example.com/story" for r in rows)
    assert all(r["text"] == "breaking & news" for r in rows)
    assert docs.dropDuplicates(["url", "text"]).count() == 1


# --- property: canonicalization is idempotent over URL-ish inputs -----------

from hypothesis import given, settings, strategies as st

_url_strategy = st.builds(
    lambda scheme, host, path, q, frag: f"{scheme}://{host}{path}{q}{frag}",
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,20}\.[a-z]{2,5}", fullmatch=True),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,4}/?", fullmatch=True),
    q=st.sampled_from(["", "?a=1", "?utm_source=x", "?utm_source=x&b=2", "?a=1&gclid=z"]),
    frag=st.sampled_from(["", "#top", "#a/b?c=1"]),
)


@settings(max_examples=30, deadline=None)
@given(url=_url_strategy)
def test_canonical_url_idempotent_property(spark, url):
    once = _one(spark, text_fns.canonical_url, url)
    assert _one(spark, text_fns.canonical_url, once) == once
    assert "#" not in once and "utm_" not in once and "gclid" not in once


def test_canonical_url_mid_position_tracking_param(spark):
    """Round-3 review finding: a stripped param BETWEEN two kept ones must
    heal '&&' to '&', not forge a second '?'."""
    got = _one(spark, text_fns.canonical_url, "https://example.com/a?x=1&utm_source=f&y=2")
    assert got == "https://example.com/a?x=1&y=2"
    got2 = _one(
        spark, text_fns.canonical_url, "https://example.com/a?utm_a=1&gclid=2&x=1&ref=h&y=2"
    )
    assert got2 == "https://example.com/a?x=1&y=2"


def test_html_double_escaped_entities_decode_once(spark):
    """'&amp;lt;' is the literal text '&lt;', not '<' — amp decodes last."""
    got = _one(spark, text_fns.html_to_text, "<p>a &amp;lt; b</p>")
    assert got == "a &lt; b"
    assert _one(spark, text_fns.html_to_text, "<p>x &amp; y</p>") == "x & y"
