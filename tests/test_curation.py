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


def test_curate_corpus_materialize_modes_agree(spark, tmp_path):
    """The durability knob changes HOW survivors are pinned, never WHAT the
    pipeline returns: persist (recompute-on-loss) and local_checkpoint
    (fast, restart-on-loss) must produce identical curated sets.  The
    reliable-checkpoint mode is exercised both via its precondition error
    path (no checkpoint dir set -> the checkpoint call raises) and via a
    real run under ``tmp_path`` (which pytest keeps alive past the test, so
    the shared session's checkpoint dir is never left dangling at a deleted
    location for later tests)."""
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

    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        # precondition error path: reliable checkpoint needs a directory
        import pytest

        with pytest.raises(Exception, match="[Cc]heckpoint"):
            curate_corpus(df, materialize="checkpoint").collect()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    ckpt = sorted(map(tuple, curate_corpus(df, materialize="checkpoint").collect()))
    assert ckpt == base


def test_curate_corpus_on_materialize_is_the_release_handle(spark):
    """The persist mode pins executor memory for the session's lifetime;
    ``on_materialize`` hands the caller the pinned relation so repeated
    curation runs don't accumulate caches.  Unpersisting through the hook
    must actually release the cached survivor relation."""
    rows = [(1, GOOD), (2, GOOD)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pinned = []
    out = curate_corpus(df, materialize="persist", on_materialize=pinned.append)
    result = sorted(r["doc_id"] for r in out.collect())
    assert result == [1]
    assert len(pinned) == 1 and pinned[0].is_cached
    pinned[0].unpersist(blocking=True)
    assert not pinned[0].is_cached


def test_curate_corpus_materialize_rejects_unknown_mode(spark):
    import pytest

    df = spark.createDataFrame([(1, GOOD)], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="materialize"):
        curate_corpus(df, materialize="ram_disk")
