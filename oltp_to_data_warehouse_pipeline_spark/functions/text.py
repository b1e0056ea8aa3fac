"""Text-analysis expressions (LLM-pipeline extension).

Language ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting — all pure column expressions so they run
JVM-side over arbitrarily large document tables.  Every formula is chosen to
be expressible identically in ANSI SQL (the DuckDB oracle): md5 for
fingerprints, split/filter/size for token math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# (Real deployments plug in fastText/CLD3 via a pandas_udf — the container
# has neither, so the heuristic is the in-repo implementation, not a stub.)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
}


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization (the baseline tokenizer).

    Collapse-then-split (trim → \\s+ → single space → split on ' ') rather
    than splitting on \\s+ directly: regex-split edge semantics for
    leading/trailing separators differ between engines, while this form is
    bit-identical everywhere — the SQL twin is
    ``string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.regexp_replace(F.trim(col), r"\s+", " "), " ")


def token_count(c: Column | str) -> Column:
    """Token count — whitespace tokens."""
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column | str) -> Column:
    """BPE-ish token estimate: word-boundary pieces + ceil(chars/4) blend.

    A cheap, deterministic proxy for subword token counts (≈ GPT-style
    4-chars-per-token rule averaged with word count), good enough for
    length-based corpus filtering at scale.
    """
    col = F.col(c) if isinstance(c, str) else c
    words = token_count(col)
    chars = F.length(col)
    return F.ceil((words + chars / F.lit(4.0)) / F.lit(2.0)).cast("bigint")


def stopword_count_t(t: Column, stopwords: tuple[str, ...]) -> Column:
    """Stopword count over a BOUND token array (array filter, no UDF).

    The `_t` family takes tokens as a column so a caller scoring a document
    several ways (language vote × N languages + quality + counts) binds the
    split ONCE in a prior projection — Catalyst keeps multi-referenced
    non-cheap aliases bound, and the tokenizer is by far the dominant cost
    (8 split() evaluations → 1 measured 2× on lang_id at sf0.1)."""
    return F.size(F.filter(t, lambda x: x.isin(*stopwords)))


def stopword_count(c: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``stopwords`` (tokenizes inline)."""
    return stopword_count_t(tokens(c), stopwords)


def stopword_ratio_t(t: Column, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    return stopword_count_t(t, stopwords) / F.greatest(F.size(t), F.lit(1))


def stopword_ratio(c: Column | str, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    return stopword_ratio_t(tokens(c), stopwords)


def avg_token_len_t(c: Column | str, t: Column) -> Column:
    """Mean token length from the raw text + a bound token array."""
    col = F.col(c) if isinstance(c, str) else c
    n = F.greatest(F.size(t), F.lit(1))
    non_space = F.length(F.regexp_replace(col, r"\s+", ""))
    return non_space / n


def avg_token_len(c: Column | str) -> Column:
    """Mean token length in characters (punct-free texts: chars−spaces ÷ n)."""
    return avg_token_len_t(c, tokens(c))


def quality_score_t(c: Column | str, t: Column) -> Column:
    """Composite quality score over raw text + a bound token array."""
    col = F.col(c) if isinstance(c, str) else c
    length_ok = F.when(F.length(col) >= 50, F.lit(0.4)).otherwise(F.lit(0.0))
    atl = avg_token_len_t(col, t)
    atl_ok = F.when((atl >= 3) & (atl <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio_t(t) >= 0.02, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + atl_ok + sw_ok, 1)


def quality_score(c: Column | str) -> Column:
    """Composite quality score in [0,1]: length, token-length sanity,
    stopword presence.  Mirrors common corpus-filter heuristics (Gopher-style
    rules) in a single expression:

      0.4·(50 ≤ chars)  + 0.3·(3 ≤ avg_token_len ≤ 10) + 0.3·(stop_ratio ≥ 0.02)
    """
    return quality_score_t(c, tokens(c))


def lang_guess_t(t: Column) -> Column:
    """Stopword-vote language ID over a BOUND token array: the language
    whose stopword list matches the most tokens wins; ties/zero-evidence →
    'und' (undetermined).

    Expressed as a greatest-of-struct trick so it stays one expression:
    struct(count, -ord, lang) compared lexicographically by greatest().
    """
    candidates = []
    for i, (lang, stops) in enumerate(sorted(LANG_STOPWORDS.items())):
        cnt = stopword_count_t(t, stops)
        # -i orders ties deterministically toward the alphabetically-first lang
        candidates.append(F.struct(cnt.alias("n"), F.lit(-i).alias("tie"), F.lit(lang).alias("lang")))
    best = F.greatest(*candidates)
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_guess(c: Column | str) -> Column:
    """Stopword-vote language ID (tokenizes inline — for single-expression
    use; bind tokens() and use lang_guess_t when scoring multiple ways)."""
    return lang_guess_t(tokens(c))


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams over a token array, as space-joined strings; empty array
    when the document has fewer than ``n`` tokens.

    Pure higher-order-function form (sequence + transform + slice), so the
    n-gram fan-out happens JVM-side inside whole-stage codegen — no UDF and
    no pre-explode shuffle.  The SQL twin is
    ``list_transform(range(1, len(t)-(n-2)), i -> array_to_string(t[i:i+n-1], ' '))``.
    """
    size = F.size(toks)
    idx = F.sequence(F.lit(1), size - (n - 1))
    return F.when(
        size >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(c: Column | str, n: int = 8) -> Column:
    """md5 hashes of ``n``-token shingles (the decontamination / near-dup
    unit).  Hashing at the source keeps every downstream join/shuffle on
    32-byte keys instead of raw shingle text — shuffle bytes ∝ rows, not
    document size."""
    return F.transform(word_ngrams(tokens(c), n), F.md5)


def fingerprint(c: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the text (engine-portable)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.md5(col)


def normalized_text(c: Column | str) -> Column:
    """lower + collapse whitespace — THE shared normalization for both
    fingerprint families (exact dedup and winnowing); keep it single-sourced
    so a change here cannot desynchronize them."""
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def normalized_fingerprint(c: Column | str) -> Column:
    """Whitespace/case-insensitive fingerprint: md5 of normalized_text."""
    return F.md5(normalized_text(c))


def char_gram_hashes(c: Column | str, k: int = 5) -> Column:
    """Rolling window of character k-gram hashes, as array<string>.

    The hash per position is md5 of the k-char substring — semantically the
    rolling-hash sequence of Rabin-Karp (one hash per sliding position),
    expressed portably (md5 + substring exist in every engine; lexicographic
    compare of hex ≡ numeric compare of a uniform hash).  Texts shorter than
    k yield their single (short) gram.
    """
    norm = normalized_text(c)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.md5(norm.substr(i, F.lit(k))))


def window_minima(grams: Column | str, w: int = 4) -> Column:
    """Distinct minimum of every w-window over a hash array (the winnowing
    selection step).  IMPORTANT: pass a *bound column* (project the gram
    array first), not the gram expression itself — inlined, the gram
    computation would be re-evaluated per window (m× the hashing work)."""
    g = F.col(grams) if isinstance(grams, str) else grams
    wins = F.sequence(F.lit(0), F.greatest(F.size(g) - w, F.lit(0)))
    return F.array_distinct(F.transform(wins, lambda j: F.array_min(F.slice(g, j + 1, w))))


def winnowing_fingerprints(df, id_col: str, text_col: str, k: int = 5, w: int = 4):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — the
    MOSS algorithm): hash every char k-gram, select the minimum of each
    w-window of consecutive gram hashes, dedupe.  Returns (id, fp) rows.

    Guarantee: any shared substring of length ≥ w+k-1 between two documents
    contributes at least one SHARED fingerprint — robust to insertions/
    deletions elsewhere, unlike whole-document hashes.  Output size is
    ~2/(w+1) of the gram count.  Narrow map + explode, no shuffle.  The gram
    array is materialized in its own projection so the m hashes are computed
    once per document, not once per window (Catalyst's CollapseProject keeps
    multi-referenced non-cheap aliases bound).
    """
    grams = df.select(F.col(id_col), char_gram_hashes(text_col, k).alias("__grams"))
    return grams.select(F.col(id_col), F.explode(window_minima("__grams", w)).alias("fp"))


# ---------------------------------------------------------------------------
# PII scrubbing — regex families chosen to parse identically under Java
# regex (Spark) and RE2 (the DuckDB oracle): no backreferences, no
# lookaround, character classes and bounded repetition only.
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) applied IN ORDER — email before phone so an
#: address's digit run is already collapsed when the phone pass scans.
#: The phone family requires ≥ 9 DIGITS (separators not counted): 8-digit
#: runs like ISO dates (2026-08-14) never match; 9+-digit identifiers that
#: merely look like international numbers (ISBN-13s) do — the documented
#: over-redaction limit of any lookahead-free (RE2-compatible) heuristic.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d(-?\d){8,14}", "<PHONE>"),
)


def pii_counts(c: Column | str) -> list[Column]:
    """One match-count column per PII family, measured on the RAW text (the
    scrub below rewrites in sequence, so counting afterwards would undercount
    overlapping families identically in any engine — counting first keeps
    the per-family number meaningful)."""
    col = F.col(c) if isinstance(c, str) else c
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}") for name, pat, _ in PII_PATTERNS
    ]


def pii_scrub(c: Column | str) -> Column:
    """Text with every PII family replaced by its placeholder token.

    Sequential regexp_replace chain (global replace in both engines); pure
    expression, so at 100 TB this is a narrow map fused into the scan."""
    out = F.col(c) if isinstance(c, str) else c
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# Chunking — fixed-size token windows with overlap, the packing unit for
# context-window-bounded training samples.
# ---------------------------------------------------------------------------


def chunk_spans(toks: Column, size: int = 64, overlap: int = 16) -> Column:
    """array<struct<chunk_idx,tok_start,tok_end>> covering the token array in
    ``size``-token windows advancing by ``size - overlap``.

    Every document yields ≥ 1 chunk (short docs yield their whole token
    range); the final chunk is clipped to the token count.  Bounds are pure
    integer math — ceil via floor((n - overlap + stride - 1) / stride), which
    is exact double arithmetic for any realistic document length — so the
    SQL twin agrees bit-for-bit.  tok_start is 0-based; tok_end exclusive.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size (stride would not advance)")
    stride = size - overlap
    n = F.size(toks)
    n_chunks = F.greatest(
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride).cast("int").alias("tok_start"),
            F.least(i * stride + size, n).cast("int").alias("tok_end"),
        ),
    )
    # NULL token arrays yield NO spans (empty array, so a downstream explode
    # drops the row).  Without the guard, size(NULL)=NULL rides through
    # greatest/least (which skip NULLs) and fabricates a (0, 0, size) span
    # claiming tokens that don't exist.
    return F.when(toks.isNotNull(), spans).otherwise(
        F.array().cast("array<struct<chunk_idx:int,tok_start:int,tok_end:int>>")
    )


def char_entropy(c: Column | str) -> Column:
    """Shannon entropy (bits/char) of the normalized character distribution —
    the cheap gibberish/repetition detector (natural prose ≈ 4 bits, runs of
    one character ≈ 0, random base64 ≈ 6).

    Zero-shuffle formulation: chars enumerate via substring over an index
    sequence (NOT split-on-empty-string, whose edge semantics differ between
    Java regex and other engines), then ONE run-length fold over the SORTED
    char array computes Σ run·log2(run) in a single O(len) pass —
    H = log2(N) − Σ run·log2(run)/N.  (The textbook per-symbol form,
    Σ over alphabet of size(filter(chars, =c)), is O(alphabet·len) inside an
    interpreted higher-order function and measured 40× slower at sf0.01.)
    Per-character explode would instead turn a 100 TB corpus into 10¹⁴
    shuffle rows for what a narrow map computes in-place.  Empty texts score
    0 via the greatest(len, 1) guard.
    """
    norm = normalized_text(c)
    n = F.greatest(F.length(norm), F.lit(1))
    chars = F.array_sort(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(1)))
    )

    def close_run(acc: Column) -> Column:
        # a finished run of length r contributes r·log2(r) (0 for r ≤ 1)
        return acc["s"] + F.when(
            acc["run"] > 1, acc["run"] * F.log2(acc["run"])
        ).otherwise(F.lit(0.0))

    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0.0).alias("run"),
        F.lit(0.0).alias("s"),
    )
    folded = F.aggregate(
        chars,
        acc0,
        lambda acc, ch: F.struct(
            ch.alias("prev"),
            F.when(acc["prev"].eqNullSafe(ch), acc["run"] + 1).otherwise(F.lit(1.0)).alias("run"),
            F.when(acc["prev"].eqNullSafe(ch), acc["s"]).otherwise(close_run(acc)).alias("s"),
        ),
        close_run,
    )
    return F.log2(n) - folded / n


def char_entropy_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document char-entropy stats via an Arrow-batched scorer:
    (id, n_chars_norm, n_distinct_chars, entropy_bits-unrounded).

    Same math as :func:`char_entropy` (equivalence is unit-tested), but a
    counting pass in vectorized Python instead of a per-character
    interpreted lambda fold — higher-order functions are CodegenFallback,
    and the fold measured 26 s at sf0.1 where this runs in well under a
    second.  Still a narrow map: ``mapInPandas`` adds NO exchange, so the
    zero-shuffle scale posture is identical; this is the sanctioned
    Pandas-UDF escape hatch for compute the built-ins only express
    interpretedly.  Normalization mirrors normalized_text exactly: Java's
    ASCII \\s class (NOT Python's unicode \\s), trim, collapse, lower.
    """
    import math
    import re
    from collections import Counter

    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("n_chars_norm", T.IntegerType()),
            T.StructField("n_distinct_chars", T.IntegerType()),
            T.StructField("entropy_raw", T.DoubleType()),
        ]
    )
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            ids, ns, ds, hs = [], [], [], []
            for i, s in zip(pdf[id_col], pdf[text_col]):
                # .strip(" ") — Spark's trim removes SPACES only; Python's
                # bare strip() would also eat \t/\n/NBSP and diverge from
                # the expression twin on tab/newline-padded documents
                norm = ws.sub(" ", (s or "").strip(" ")).lower()
                n = max(len(norm), 1)
                counts = Counter(norm) if norm else Counter({"": 1})
                h = math.log2(n) - sum(c * math.log2(c) for c in counts.values()) / n
                ids.append(i)
                ns.append(n)
                ds.append(len(counts))
                hs.append(h)
            yield pd.DataFrame(
                {id_col: ids, "n_chars_norm": ns, "n_distinct_chars": ds, "entropy_raw": hs}
            )

    from oltp_to_data_warehouse_pipeline_spark.util import ensure_min_parallelism

    return ensure_min_parallelism(df).select(id_col, text_col).mapInPandas(score, schema)


# ---------------------------------------------------------------------------
# Crawl-ingest helpers: URL canonicalization + HTML text extraction.
# Pure column expressions (regexp chains) so they run in the scan stage of a
# WARC→documents pipeline — no Python in the hot path.
# ---------------------------------------------------------------------------


def canonical_url(c: Column | str) -> Column:
    """Canonical form of a URL for dedup keys: lowercase scheme+host, strip
    fragment, strip common tracking query params (utm_*, fbclid, gclid,
    ref), drop a now-empty query, collapse duplicate slashes in the path,
    strip the trailing path slash (the bare root therefore canonicalizes
    WITHOUT its slash, so both root spellings collapse to one key).

    Deliberately NOT full RFC 3986 normalization (no IDN, no %-decoding, no
    default-port logic) — this is the cheap scan-stage key that collapses
    the overwhelmingly common crawl aliases; anything stricter belongs in a
    fetch-time normalizer.  Deterministic, so the same URL always lands in
    the same dedup bucket.
    """
    col = F.col(c) if isinstance(c, str) else c
    u = F.trim(col)
    # fragment first: everything after # never reaches the server
    u = F.regexp_replace(u, r"#.*$", "")
    # lowercase ONLY scheme://host (path/query are case-sensitive)
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", "")
    u = F.when(scheme_host == "", u).otherwise(F.concat(scheme_host, rest))
    # tracking params (leading ? or & kept with the param), then heal the
    # separators the removal leaves behind — ORDER MATTERS and '&&' must
    # collapse to '&', never '?' (a stripped param BETWEEN two kept ones
    # leaves '&&'; turning that into '?' forged a second query start,
    # round-3 review finding)
    u = F.regexp_replace(u, r"([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&#]*", "$1")
    u = F.regexp_replace(u, r"&{2,}", "&")        # x&&y   -> x&y
    u = F.regexp_replace(u, r"\?&+", "?")         # ?&x    -> ?x
    u = F.regexp_replace(u, r"[?&]+$", "")        # now-empty query / trailing &
    # duplicate slashes in the path (not the scheme's //)
    u = F.regexp_replace(u, r"(?<!:)//+", "/")
    # trailing path slash — at end of string or just before the query
    u = F.regexp_replace(u, r"(?<!:)/(\?|$)", "$1")
    return u


def html_to_text(c: Column | str) -> Column:
    """Crude-but-standard first-pass HTML → text: drop script/style/head
    blocks and comments, strip tags, decode the five predefined entities +
    nbsp, collapse whitespace.

    This is the scan-stage extraction every crawl pipeline runs before
    quality/dedup; a DOM-accurate extractor (trafilatura-class) is a
    mapInPandas plug-in on the same column, exactly like the media codec
    seam.  Expression-only: case-insensitive regexp_replace chain, zero
    Python, zero shuffle.
    """
    col = F.col(c) if isinstance(c, str) else c
    t = F.regexp_replace(col, r"(?is)<(script|style|head)\b.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block-level closers/openers become separators so words don't fuse
    t = F.regexp_replace(t, r"(?i)</?(p|div|br|li|tr|h[1-6]|td|th)\b[^>]*>", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", "")
    # '&amp;' decodes LAST: decoding it first would mint new '&lt;'/'&gt;'
    # from double-escaped text ('&amp;lt;' means the literal string '&lt;',
    # not '<' — round-3 review finding)
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))
