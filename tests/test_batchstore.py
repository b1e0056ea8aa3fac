"""Batch-layout store maintenance: compaction below the replay horizon
(crash-safe, probe-invariant for before_batch_id >= upto) and takedown
tombstones (immediate filtering, physical excision + list clearing at
compaction)."""

from __future__ import annotations

import json

import pytest

from oltp_to_data_warehouse_pipeline_spark import fs
from oltp_to_data_warehouse_pipeline_spark.operators import batchstore, lshindex
from oltp_to_data_warehouse_pipeline_spark.streaming.dedup_ingest import (
    dedup_ingest_sink,
    takedown,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
FRESH = "one two three four five six seven eight nine ten eleven twelve"
OTHER = "red orange yellow green blue indigo violet ultraviolet x y z w"


def _build_store(spark, base: str) -> None:
    """Three folded batches: corpus {1: BASE, 2: OTHER, 4: FRESH} (3 is a
    near-dup of 1, rejected in batch 1)."""
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    sink(spark.createDataFrame([(1, BASE)], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(2, OTHER)], "doc_id long, text string"), 1)
    sink(
        spark.createDataFrame([(3, NEAR), (4, FRESH)], "doc_id long, text string"),
        2,
    )


def _probe_pairs(spark, base: str, text: str, before: int) -> set:
    probe = spark.createDataFrame([(99, text)], "doc_id long, text string")
    return {
        (r["probe_id"], r["index_id"])
        for r in lshindex.lsh_probe_verified(
            probe,
            f"{base}/idx",
            batchstore.read_batches(spark, f"{base}/corpus", id_col="doc_id"),
            threshold=0.5,
            before_batch_id=before,
        ).collect()
    }


def _corpus_ids(spark, base: str) -> list[int]:
    return sorted(
        r["doc_id"]
        for r in batchstore.read_batches(
            spark, f"{base}/corpus", id_col="doc_id"
        ).collect()
    )


def test_compact_preserves_probe_and_folds_partitions(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    before_pairs = _probe_pairs(spark, base, NEAR, before=10)
    before_corpus = _corpus_ids(spark, base)
    assert batchstore.batch_partitions(spark, f"{base}/idx") == [0, 1, 2]

    for path, idc in ((f"{base}/idx", "doc"), (f"{base}/corpus", "doc_id")):
        stats = batchstore.compact(spark, path, upto_batch_id=3, id_col=idc)
        assert stats["folded"] == 3 and stats["dest"] == 2
        assert batchstore.batch_partitions(spark, path) == [2]

    assert _probe_pairs(spark, base, NEAR, before=10) == before_pairs == {(99, 1)}
    assert _corpus_ids(spark, base) == before_corpus == [1, 2, 4]


def test_compact_below_horizon_keeps_later_batches_byte_identical(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    # fold only batches {0, 1}; batch 2 stays its own partition
    want = _probe_pairs(spark, base, NEAR, before=2)
    stats = batchstore.compact(spark, f"{base}/idx", upto_batch_id=2, id_col="doc")
    assert stats["folded"] == 2 and stats["dest"] == 1
    assert batchstore.batch_partitions(spark, f"{base}/idx") == [1, 2]
    # probes at or above the horizon see identical content
    assert _probe_pairs(spark, base, NEAR, before=2) == want
    assert _probe_pairs(spark, base, NEAR, before=10) == {(99, 1)}


def test_compact_noop_without_work(spark, tmp_path):
    base = str(tmp_path / "s")
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    sink(spark.createDataFrame([(1, BASE)], "doc_id long, text string"), 0)
    stats = batchstore.compact(spark, f"{base}/idx", upto_batch_id=5, id_col="doc")
    assert stats["folded"] == 0
    assert batchstore.batch_partitions(spark, f"{base}/idx") == [0]


def test_takedown_filters_immediately_then_readmits_similar(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    takedown(spark, f"{base}/idx", f"{base}/corpus", [1])

    # reads and probes forget doc 1 at once (band rows still on disk)
    assert _corpus_ids(spark, base) == [2, 4]
    assert _probe_pairs(spark, base, NEAR, before=10) == set()
    # the gate now ADMITS a near-dup of the removed document…
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    sink(spark.createDataFrame([(5, NEAR)], "doc_id long, text string"), 3)
    assert _corpus_ids(spark, base) == [2, 4, 5]
    # …and the freed id can be re-used with fresh content
    sink(
        spark.createDataFrame(
            [(1, "entirely new words nothing shared here at all")],
            "doc_id long, text string",
        ),
        4,
    )
    assert _corpus_ids(spark, base) == [1, 2, 4, 5]


def test_compact_excises_tombstones_physically_and_clears_list(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    takedown(spark, f"{base}/idx", f"{base}/corpus", [1])
    stats = batchstore.compact(
        spark, f"{base}/corpus", upto_batch_id=3, id_col="doc_id"
    )
    assert stats["tombstones_cleared"] is True
    # raw read (no tombstone filter) proves physical excision
    raw = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{base}/corpus").collect()
    )
    assert raw == [2, 4]
    assert not fs.exists(
        spark, fs.join(f"{base}/corpus", batchstore.TOMBSTONE_DIR)
    )


def test_partial_compact_keeps_tombstone_list(spark, tmp_path):
    """Tombstoned rows may still live in un-folded partitions — the list
    must survive a below-horizon compact."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    takedown(spark, f"{base}/idx", f"{base}/corpus", [4])  # admitted in batch 2
    stats = batchstore.compact(
        spark, f"{base}/corpus", upto_batch_id=2, id_col="doc_id"
    )
    assert stats["tombstones_cleared"] is False
    assert _corpus_ids(spark, base) == [1, 2]  # still filtered by the list


def test_recover_finishes_drop_and_rename(spark, tmp_path):
    """Crash after the manifest commit, mid-drop: recover() completes the
    fold deterministically."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    path = f"{base}/corpus"
    want = _corpus_ids(spark, base)

    rows = spark.read.parquet(path).where("batch_id < 3").drop("batch_id")
    rows.coalesce(1).write.mode("overwrite").parquet(fs.join(path, batchstore.TMP_DIR))
    fs.write_text(
        spark,
        fs.join(path, batchstore.MANIFEST),
        json.dumps(
            {"upto": 3, "dest": "batch_id=2",
             "drop": ["batch_id=0", "batch_id=1", "batch_id=2"]}
        ),
    )
    fs.delete(spark, fs.join(path, "batch_id=0"))  # crash mid-drop

    assert batchstore.recover(spark, path) is True
    assert batchstore.batch_partitions(spark, path) == [2]
    assert _corpus_ids(spark, base) == want
    assert not fs.exists(spark, fs.join(path, batchstore.MANIFEST))
    # second recover is a no-op
    assert batchstore.recover(spark, path) is False


def test_recover_discards_uncommitted_tmp(spark, tmp_path):
    """Crash BEFORE the manifest commit: the old state is authoritative and
    the stray tmp dir is discarded."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    path = f"{base}/idx"
    spark.range(3).write.parquet(fs.join(path, batchstore.TMP_DIR))
    assert batchstore.recover(spark, path) is False
    assert not fs.exists(spark, fs.join(path, batchstore.TMP_DIR))
    assert batchstore.batch_partitions(spark, path) == [0, 1, 2]


def test_compact_is_idempotent(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    path = f"{base}/idx"
    batchstore.compact(spark, path, upto_batch_id=3, id_col="doc")
    want = _probe_pairs(spark, base, NEAR, before=10)
    stats = batchstore.compact(spark, path, upto_batch_id=3, id_col="doc")
    assert stats["folded"] == 0  # single folded partition, nothing to do
    assert _probe_pairs(spark, base, NEAR, before=10) == want


def test_delete_docs_empty_and_repeat(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    batchstore.delete_docs(spark, f"{base}/corpus", [], "doc_id")
    assert batchstore.tombstones(spark, f"{base}/corpus", "doc_id") is None
    batchstore.delete_docs(spark, f"{base}/corpus", [2], "doc_id")
    batchstore.delete_docs(spark, f"{base}/corpus", [2], "doc_id")  # repeat
    assert _corpus_ids(spark, base) == [1, 4]


def test_streaming_run_after_compact_continues_clean(spark, tmp_path):
    """e2e: compact below the horizon, then keep folding — later batches
    land beside the folded prefix and the gate's decisions are unchanged."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    for path, idc in ((f"{base}/idx", "doc"), (f"{base}/corpus", "doc_id")):
        batchstore.compact(spark, path, upto_batch_id=3, id_col=idc)
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    # near-dup of admitted doc 1 still rejected after the fold
    sink(spark.createDataFrame([(7, NEAR)], "doc_id long, text string"), 3)
    assert _corpus_ids(spark, base) == [1, 2, 4]
    sink(spark.createDataFrame([(8, "totally disjoint words appear only here")],
                               "doc_id long, text string"), 4)
    assert _corpus_ids(spark, base) == [1, 2, 4, 8]
    assert batchstore.batch_partitions(spark, f"{base}/idx") == [2, 3, 4]


def test_recover_after_rename_keeps_consolidated_dest(spark, tmp_path):
    """Crash in the rename->manifest-delete window: the tmp dir is gone and
    the dest partition IS the consolidated data — recover() must not drop
    it (round-11 review: it was in the manifest's drop list)."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    path = f"{base}/corpus"
    want = _corpus_ids(spark, base)

    rows = spark.read.parquet(path).where("batch_id < 3").drop("batch_id")
    rows.coalesce(1).write.mode("overwrite").parquet(fs.join(path, batchstore.TMP_DIR))
    fs.write_text(
        spark,
        fs.join(path, batchstore.MANIFEST),
        json.dumps(
            {"upto": 3, "dest": "batch_id=2",
             "drop": ["batch_id=0", "batch_id=1", "batch_id=2"]}
        ),
    )
    for p in ("batch_id=0", "batch_id=1", "batch_id=2"):
        fs.delete(spark, fs.join(path, p))
    assert fs.rename(
        spark, fs.join(path, batchstore.TMP_DIR), fs.join(path, "batch_id=2")
    )
    # crash here: manifest still present, tmp gone, dest = only copy
    assert batchstore.recover(spark, path) is True
    assert batchstore.batch_partitions(spark, path) == [2]
    assert _corpus_ids(spark, base) == want


def test_compact_refuses_to_skip_existing_tombstones(spark, tmp_path):
    base = str(tmp_path / "s")
    _build_store(spark, base)
    takedown(spark, f"{base}/idx", f"{base}/corpus", [1])
    with pytest.raises(ValueError, match="tombstones but no id_col"):
        batchstore.compact(spark, f"{base}/corpus", upto_batch_id=3)


def test_takedown_of_empty_store_is_noop(spark, tmp_path):
    path = str(tmp_path / "never_written")
    batchstore.delete_docs(spark, path, [1, 2], "doc_id")
    assert batchstore.tombstones(spark, path, "doc_id") is None


def test_string_id_tombstones(spark, tmp_path):
    base = str(tmp_path / "s")
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus", id_col="url")
    sink(
        spark.createDataFrame(
            [("sha1:aa", BASE), ("sha1:bb", OTHER)], "url string, text string"
        ),
        0,
    )
    takedown(spark, f"{base}/idx", f"{base}/corpus", ["sha1:aa"], id_col="url")
    left = sorted(
        r["url"]
        for r in batchstore.read_batches(
            spark, f"{base}/corpus", id_col="url"
        ).collect()
    )
    assert left == ["sha1:bb"]


def test_reader_and_probe_refuse_mid_recovery_store(spark, tmp_path):
    """A crashed compact leaves the manifest on disk; readers must fail
    loudly rather than silently read the half-dropped store."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    for path in (f"{base}/corpus", f"{base}/idx"):
        fs.write_text(
            spark, fs.join(path, batchstore.MANIFEST),
            json.dumps({"upto": 3, "dest": "batch_id=2", "drop": []}),
        )
    with pytest.raises(RuntimeError, match="unfinished compact"):
        batchstore.read_batches(spark, f"{base}/corpus", id_col="doc_id")
    probe = spark.createDataFrame([(99, NEAR)], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="unfinished compact"):
        lshindex.lsh_probe(probe, f"{base}/idx")


def test_sink_recovers_crashed_compact_before_probing(spark, tmp_path):
    """Crash window from the round-11 second review: compact dropped every
    partition but died before the tmp->dest rename.  The next fold must
    finish the recovery and probe the REAL index — not read 'empty index'
    and admit a near-dup unprobed."""
    base = str(tmp_path / "s")
    _build_store(spark, base)
    path = f"{base}/idx"
    rows = spark.read.parquet(path).where("batch_id < 3").drop("batch_id")
    rows.coalesce(1).write.mode("overwrite").parquet(fs.join(path, batchstore.TMP_DIR))
    fs.write_text(
        spark, fs.join(path, batchstore.MANIFEST),
        json.dumps({"upto": 3, "dest": "batch_id=2",
                    "drop": ["batch_id=0", "batch_id=1", "batch_id=2"]}),
    )
    for p in ("batch_id=0", "batch_id=1", "batch_id=2"):
        fs.delete(spark, fs.join(path, p))  # crash: all partitions gone

    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    sink(spark.createDataFrame([(7, NEAR)], "doc_id long, text string"), 3)
    # NEAR is a near-dup of admitted doc 1 — it must have been REJECTED,
    # which is only possible if the fold recovered the index first
    assert _corpus_ids(spark, base) == [1, 2, 4]
    assert not fs.exists(spark, fs.join(path, batchstore.MANIFEST))


def test_takedown_reports_false_on_missing_store(spark, tmp_path):
    ok = takedown(
        spark, str(tmp_path / "no_idx"), str(tmp_path / "no_corpus"), [1]
    )
    assert ok is False
