"""End-to-end corpus curation: every gate does its job."""

from __future__ import annotations

from oltp_to_data_warehouse_pipeline_spark.plans.curation import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away to the "
    "hills where the sun is shining and the grass is green all summer long"
)


def test_curate_corpus_stages(spark):
    rows = [
        (1, GOOD),                        # survives everything
        (2, GOOD),                        # exact duplicate of 1 -> dropped (keep min id)
        (3, "  " + GOOD.upper() + "  "),  # normalized duplicate of 1 -> dropped
        (4, GOOD + " extra tail words"),  # near-dup of 1 (high jaccard) -> dropped
        (5, "short"),                     # fails quality (length < 50)
        (6, "der die das und ist ein der die das und ist ein der die das und ist ein"),  # German
        (7, "a completely different english document about the sea and the sky "
            "where many boats of all kinds are sailing to the far horizon today"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r["n_tokens"] for r in curate_corpus(df).collect()}
    assert set(out) == {1, 7}
    assert out[1] == len(GOOD.split(" "))


def test_curate_corpus_near_dup_keeps_lower_id(spark):
    rows = [
        (10, GOOD),
        (2, GOOD + " with a small tail"),  # near-dup pair -> lower id (2) wins
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = sorted(r["doc_id"] for r in curate_corpus(df).collect())
    assert out == [2]


def test_curate_corpus_materialize_modes_agree(spark):
    """The durability knob changes HOW survivors are pinned, never WHAT the
    pipeline returns: persist (recompute-on-loss) and local_checkpoint
    (fast, restart-on-loss) must produce identical curated sets.  The
    reliable-checkpoint mode needs a checkpoint dir, so it is exercised
    via its precondition error path plus a real run under a temp dir."""
    rows = [
        (1, GOOD),
        (2, GOOD),
        (3, GOOD + " extra tail words"),
        (7, "a completely different english document about the sea and the sky "
            "where many boats of all kinds are sailing to the far horizon today"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    base = sorted(map(tuple, curate_corpus(df).collect()))
    persisted = sorted(map(tuple, curate_corpus(df, materialize="persist").collect()))
    assert persisted == base
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        ckpt = sorted(map(tuple, curate_corpus(df, materialize="checkpoint").collect()))
    assert ckpt == base


def test_curate_corpus_materialize_rejects_unknown_mode(spark):
    import pytest

    df = spark.createDataFrame([(1, GOOD)], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="materialize"):
        curate_corpus(df, materialize="ram_disk")
