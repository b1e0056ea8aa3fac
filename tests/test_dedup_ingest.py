"""Dedup-on-ingest streaming sink: near-dups of the already-admitted
corpus are rejected at the gate, within-batch near-dups collapse, writes
are per-batch overwrites so a replayed batch (or a full fresh-checkpoint
replay) converges to the identical corpus/index state."""

from __future__ import annotations

import json

from oltp_to_data_warehouse_pipeline_spark.operators import lshindex
from oltp_to_data_warehouse_pipeline_spark.streaming.dedup_ingest import (
    dedup_ingest_sink,
)

# 12-word base text; NEAR is one word changed (3-gram jaccard 9/11 ≈ 0.82,
# LSH candidate probability ~1 at 8 hashes / 4 bands and deterministic
# under the md5 hash family); FRESH shares no shingles.
BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
NEAR = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
FRESH = "one two three four five six seven eight nine ten eleven twelve"
OTHER = "red orange yellow green blue indigo violet ultraviolet x y z w"


def _write_batches(src):
    src.mkdir()
    b0 = [{"doc_id": 1, "text": BASE}, {"doc_id": 2, "text": OTHER}]
    b1 = [{"doc_id": 3, "text": NEAR}, {"doc_id": 4, "text": FRESH}]
    # batch 2: 5 is a near-dup of FRESH (admitted in b1) -> rejected;
    # 6 and 7 are near-dups of each other within the batch -> 7 loses
    b2 = [
        {"doc_id": 5, "text": FRESH.replace("twelve", "dozen")},
        {"doc_id": 6, "text": "p q r s t u v aa bb cc dd ee"},
        {"doc_id": 7, "text": "p q r s t u v aa bb cc dd ff"},
    ]
    import os
    import time

    now = time.time()
    for i, rows in enumerate([b0, b1, b2]):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        # the file source orders batches by modification time; equal
        # mtimes from a fast writer make batch order nondeterministic
        os.utime(p, (now + i * 10, now + i * 10))


def _run(spark, src, base, ckpt):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            dedup_ingest_sink(
                f"{base}/idx", f"{base}/corpus", reject_path=f"{base}/rejects"
            )
        )
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _corpus_ids(spark, base):
    return sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{base}/corpus").select("doc_id").collect()
    )


def test_gate_rejects_corpus_and_within_batch_near_dups(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(src)
    base = str(tmp_path / "store")
    _run(spark, src, base, tmp_path / "ckpt1")

    # 3 rejected (near-dup of 1), 5 rejected (near-dup of 4), 7 rejected
    # (within-batch near-dup of 6, higher id loses)
    assert _corpus_ids(spark, base) == [1, 2, 4, 6]
    rejects = {
        (r["doc_id"], r["matched_index_id"])
        for r in spark.read.parquet(f"{base}/rejects").collect()
    }
    assert rejects == {(3, 1), (5, 4)}  # within-batch losers are not audited
    # the index stays probe-consistent with the admitted corpus
    probe = spark.createDataFrame([(99, NEAR)], "doc_id long, text string")
    hits = {
        r["index_id"]
        for r in lshindex.lsh_probe_verified(
            probe, f"{base}/idx", spark.read.parquet(f"{base}/corpus"),
            threshold=0.5,
        ).collect()
    }
    assert hits == {1}


def test_full_replay_from_fresh_checkpoint_converges(spark, tmp_path):
    src = tmp_path / "src"
    _write_batches(src)
    base = str(tmp_path / "store")
    _run(spark, src, base, tmp_path / "ckpt1")
    want = _corpus_ids(spark, base)
    _run(spark, src, base, tmp_path / "ckpt2")  # every batch re-delivered
    assert _corpus_ids(spark, base) == want
    # no duplicate admitted rows anywhere (per-batch overwrite, not append)
    n = spark.read.parquet(f"{base}/corpus").count()
    assert n == len(want)


def test_single_batch_refold_is_idempotent(spark, tmp_path):
    """The crash-replay unit: calling the fold twice with the same epoch id
    rewrites the same partitions and admits the same survivors — the probe
    reads only partitions strictly BEFORE the batch's id, so the second
    fold sees exactly the pre-batch index."""
    base = str(tmp_path / "store")
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], "doc_id long, text string")
    b1 = spark.createDataFrame([(3, NEAR), (4, FRESH)], "doc_id long, text string")
    sink(b0, 0)
    sink(b1, 1)
    want = _corpus_ids(spark, base)
    sink(b1, 1)  # replayed after its own writes landed
    assert _corpus_ids(spark, base) == want == [1, 2, 4]


def test_mismatched_index_parameters_refused(spark, tmp_path):
    import pytest

    base = str(tmp_path / "store")
    b0 = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")(b0, 0)
    other = dedup_ingest_sink(
        f"{base}/idx", f"{base}/corpus", num_hashes=6, bands=3
    )
    with pytest.raises(ValueError, match="incomparable"):
        other(b0, 1)


def test_same_id_redelivery_is_absorbed(spark, tmp_path):
    """An admitted document re-delivered in a LATER batch under the same id
    must not be re-admitted (round-11 review: the probe's self-match
    exclusion alone would wave an exact re-upload through)."""
    base = str(tmp_path / "store")
    sink = dedup_ingest_sink(f"{base}/idx", f"{base}/corpus")
    b0 = spark.createDataFrame([(1, BASE), (2, OTHER)], "doc_id long, text string")
    sink(b0, 0)
    redeliver = spark.createDataFrame([(1, BASE), (8, FRESH)], "doc_id long, text string")
    sink(redeliver, 1)
    rows = spark.read.parquet(f"{base}/corpus").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2, 8]  # no duplicate id 1
    assert [r["batch_id"] for r in rows if r["doc_id"] == 1] == [0]


def test_within_batch_duplicate_ids_resolve_deterministically(spark, tmp_path):
    """Two rows sharing an id in one batch pick the SAME winner on every
    fold (content-hash LWW, not task-order dropDuplicates)."""
    base1, base2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    b = spark.createDataFrame(
        [(1, BASE), (1, OTHER)], "doc_id long, text string"
    ).repartition(8)
    dedup_ingest_sink(f"{base1}/idx", f"{base1}/corpus")(b, 0)
    dedup_ingest_sink(f"{base2}/idx", f"{base2}/corpus")(b.repartition(3), 0)
    t1 = [r["text"] for r in spark.read.parquet(f"{base1}/corpus").collect()]
    t2 = [r["text"] for r in spark.read.parquet(f"{base2}/corpus").collect()]
    assert t1 == t2 and len(t1) == 1
