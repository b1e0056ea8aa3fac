"""CCNet-style bigram-LM perplexity: hand-computed add-k scores,
short-doc exclusion, integer-exact tail gate."""

from __future__ import annotations

import math

from oltp_to_data_warehouse_pipeline_spark.operators.lm import (
    bigram_lm_scores,
    lm_quality_gate,
)


def _docs(spark, rows, schema="doc_id bigint, text string"):
    return spark.createDataFrame(rows, schema)


def test_hand_computed_add_k_bigram_scores(spark):
    # corpus: "a b a b" + "x y"; V = 4
    # c2: (a,b)=2 (b,a)=1 (x,y)=1; c1: a=2 b=1 x=1
    # doc1: p(b|a)=2.5/4 twice, p(a|b)=1.5/3 -> H = -(2*log2(.625)+log2(.5))/3
    # doc2: p(y|x)=1.5/3 -> H = 1.0, ppl = 2.0
    d = _docs(spark, [(1, "a b a b"), (2, "x y")])
    out = {r["doc_id"]: r.asDict() for r in bigram_lm_scores(d).collect()}
    lp = round(math.log2(0.625), 8)
    h1 = -(2 * lp + round(math.log2(0.5), 8)) / 3  # ppl uses UNROUNDED H
    assert out[1]["n_bigrams"] == 3
    assert out[1]["cross_entropy"] == round(h1, 4)
    assert out[1]["ppl"] == round(2.0 ** h1, 4)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["cross_entropy"] == 1.0
    assert out[2]["ppl"] == 2.0


def test_short_and_null_docs_excluded(spark):
    d = _docs(spark, [(1, "solo"), (2, None), (3, "two tokens")])
    out = bigram_lm_scores(d)
    assert [r["doc_id"] for r in out.collect()] == [3]


def test_quality_gate_tail_is_mean_offset(spark):
    # source s1: three average docs; s2: one doc of unique gibberish whose
    # bigrams are all singletons -> far above corpus mean entropy
    rows = [
        (1, "the cat sat on the mat the cat sat", "s1"),
        (2, "the cat sat on the mat the cat sat", "s1"),
        (3, "the cat sat on the mat the cat sat", "s1"),
        (4, "zq wv jx kq vz qj xw qk zv wq", "s2"),
    ]
    d = _docs(spark, rows, "doc_id bigint, text string, source string")
    got = {
        r["source"]: r.asDict()
        for r in lm_quality_gate(d, slack_bits=0.5).collect()
    }
    assert got["s1"]["n_scored"] == 3 and got["s1"]["n_tail"] == 0
    assert got["s2"]["n_scored"] == 1 and got["s2"]["n_tail"] == 1
    assert got["s2"]["tail_pct"] == 100.0
    assert got["s1"]["corpus_mean_h"] == got["s2"]["corpus_mean_h"] > 0


def test_fixture_runs_and_schema(spark):
    from oltp_to_data_warehouse_pipeline_spark.catalog import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = bigram_lm_scores(d)
    assert out.columns == ["doc_id", "n_bigrams", "cross_entropy", "ppl"]
    n = out.count()
    assert 0 < n <= d.count()
    assert out.where("ppl <= 0 OR cross_entropy < 0").count() == 0
