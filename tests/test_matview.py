"""Streaming materialized view: rollup maintained by foreachBatch equals a
from-scratch recompute, stays correct across a second stream increment, and
replays are no-ops."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from oltp_to_data_warehouse_pipeline_spark.plans.incremental_agg import (
    RollupSpec,
    read_rollup,
)
from oltp_to_data_warehouse_pipeline_spark.streaming.matview import maintain_rollup

SPEC = RollupSpec(
    keys=("day",),
    sums={"revenue": "amount"},
    maxs={"max_amount": "amount"},
)

SCHEMA = "day string, amount double"


def _write_batch(src_dir, name, rows):
    (src_dir / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run_stream(spark, src_dir, rollup, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(str(src_dir))
    q = maintain_rollup(stream, rollup, SPEC, ckpt, partition_key="day")
    q.awaitTermination(120)
    return q


def test_matview_matches_recompute_and_increments(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rollup, ckpt = str(tmp_path / "mv"), str(tmp_path / "ckpt")

    rows1 = [
        {"day": "2024-01-01", "amount": 10.0},
        {"day": "2024-01-01", "amount": 5.0},
        {"day": "2024-01-02", "amount": 7.0},
    ]
    _write_batch(src, "b1.json", rows1)
    _run_stream(spark, src, rollup, ckpt)

    got = {
        str(r["day"]): (r["revenue"], r["max_amount"], r["n_rows"])
        for r in read_rollup(spark, rollup).collect()
    }
    assert got == {"2024-01-01": (15.0, 10.0, 2), "2024-01-02": (7.0, 7.0, 1)}

    # second increment: a new file lands, stream restarts from the checkpoint
    rows2 = [
        {"day": "2024-01-02", "amount": 1.0},
        {"day": "2024-01-03", "amount": 2.0},
    ]
    _write_batch(src, "b2.json", rows2)
    _run_stream(spark, src, rollup, ckpt)

    all_rows = spark.createDataFrame(
        [(r["day"], r["amount"]) for r in rows1 + rows2], SCHEMA
    )
    expect = {
        str(r["day"]): (r["revenue"], r["max_amount"], r["n_rows"])
        for r in SPEC.partial(all_rows).collect()
    }
    got = {
        str(r["day"]): (r["revenue"], r["max_amount"], r["n_rows"])
        for r in read_rollup(spark, rollup).collect()
    }
    assert got == expect  # merge(stored, partial(delta)) == rollup(all)

    # restart with NO new data: no epoch re-fires, rollup unchanged
    _run_stream(spark, src, rollup, ckpt)
    again = {
        str(r["day"]): (r["revenue"], r["max_amount"], r["n_rows"])
        for r in read_rollup(spark, rollup).collect()
    }
    assert again == expect

    # untouched-partition check: day=2024-01-01 files were written once
    # (increment 2 did not touch that partition)
    p1 = tmp_path / "mv" / "day=2024-01-01"
    assert p1.exists()

    # derived AVG at read time
    avg = {
        str(r["day"]): r["avg_amount"]
        for r in read_rollup(
            spark, rollup, avgs={"avg_amount": ("revenue", "n_rows")}
        ).collect()
    }
    assert avg["2024-01-01"] == 7.5


def test_checkpoint_reset_does_not_collide_with_old_markers(spark, tmp_path):
    """Round-2 advisor finding: with batch_id = f"{query_name}-{epoch_id}",
    deleting/replacing the checkpoint restarts epoch ids at 0 and new
    batches collide with stale _applied markers — silently no-opped, rows
    dropped.  The checkpoint-scoped stream identity must give the fresh
    checkpoint its own marker namespace so the new data lands."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    rollup, ckpt = str(tmp_path / "mv"), str(tmp_path / "ckpt")

    _write_batch(src, "b1.json", [{"day": "2024-01-01", "amount": 10.0}])
    _run_stream(spark, src, rollup, ckpt)
    got = {str(r["day"]): r["revenue"] for r in read_rollup(spark, rollup).collect()}
    assert got == {"2024-01-01": 10.0}

    # operator resets the checkpoint (new pipeline deploy, corrupted state…)
    shutil.rmtree(ckpt)
    # the replaced stream re-reads the source from scratch: epoch 0 again
    _write_batch(src, "b2.json", [{"day": "2024-01-02", "amount": 5.0}])
    _run_stream(spark, src, rollup, ckpt)

    got = {str(r["day"]): r["revenue"] for r in read_rollup(spark, rollup).collect()}
    # Without the stream identity, epoch 0 of the new checkpoint would be
    # silently no-opped against the old "matview-0" marker and day 2 lost.
    # (day 1 re-merges too because the reset stream replays b1 — double
    # counting on RESET is the operator's documented responsibility; what
    # must never happen is a silent DROP.)
    assert "2024-01-02" in got and got["2024-01-02"] == 5.0


def test_stream_identity_respects_legacy_checkpoints(spark, tmp_path):
    """Contract of the checkpoint-scoped identity: minted once and stable
    for checkpoints it creates; NOT minted for a checkpoint that predates
    the scheme (Spark offset state present, no id file) — those stay on the
    legacy batch-id namespace so a recovery replay still matches its
    already-applied markers instead of double-merging."""
    import os

    from oltp_to_data_warehouse_pipeline_spark.streaming.matview import _stream_identity

    fresh = str(tmp_path / "fresh_ckpt")
    sid = _stream_identity(spark, fresh)
    assert sid and _stream_identity(spark, fresh) == sid  # stable across calls

    legacy = tmp_path / "legacy_ckpt"
    (legacy / "offsets").mkdir(parents=True)  # looks like a pre-scheme checkpoint
    (legacy / "offsets" / "0").write_text("{}")
    assert _stream_identity(spark, str(legacy)) is None
    # and it must NOT have retroactively minted an id
    assert not os.path.exists(str(legacy / "_matview_stream_id"))
