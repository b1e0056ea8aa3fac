"""Streaming materialized views: a rollup kept fresh by a stream.

The reference's dashboard aggregates (`DB.sql:109-124`, `DATA BI.pdf p.1`)
are recomputed from the whole warehouse on every refresh.  The streaming
completion of that surface is a *materialized view*: the same mergeable
rollup algebra as `plans/incremental_agg` (rollup(all) == merge(stored,
partial(delta))), driven by `foreachBatch` so each micro-batch folds its
partial aggregate into the stored rollup.

Why foreachBatch and not a stateful streaming aggregation: the rollup must
live in a TABLE other engines/consumers can scan (the reference serves Power
BI from warehouse tables, not from an in-flight query), survive stream
restarts without state-store migration, and admit batch backfills through
the exact same merge path.  Streaming state here is only Spark's source
offsets; the data state is the parquet rollup itself, guarded by batch-id
markers so a replayed epoch is a no-op.  One honesty note versus the upsert
sink (ST3, idempotent at any interruption point): a rollup MERGE is not
idempotent, and plain parquet cannot commit data+marker atomically — so
`refresh_rollup` journals each merge (begin marker + file inventory): a
replay after a clean job abort (inventory unchanged) retries safely, while
a replay after a possibly-committed merge fails loudly instead of silently
double-counting (see incremental_agg.refresh_rollup).

Scale: per micro-batch cost is partial-agg of the batch (map-side combine,
shuffle ∝ touched groups) + rewrite of touched rollup partitions only —
independent of table history, which is what makes a 100 TB fact stream
maintainable at minute-level freshness.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from oltp_to_data_warehouse_pipeline_spark import fs
from oltp_to_data_warehouse_pipeline_spark.plans.incremental_agg import (
    RollupSpec,
    refresh_rollup,
)


def _stream_identity(spark, checkpoint: str) -> str | None:
    """A random id minted once per checkpoint directory and stored inside
    it.  Batch-ids become ``{query_name}-{stream_id}-{epoch_id}``, which
    ties the rollup's ``_applied_batches`` namespace to the checkpoint's
    LIFETIME: delete/replace the checkpoint (epoch ids restart at 0) and
    the fresh checkpoint mints a fresh id, so new epochs can never collide
    with stale markers and be silently no-opped (round-2 advisor finding).
    Recovery replays from the SAME checkpoint keep the same id, so the
    exactly-once no-op behavior is preserved.

    Migration guard: a checkpoint that PREDATES the stream-id scheme (has
    Spark offset state but no id file) keeps the LEGACY
    ``{query_name}-{epoch_id}`` namespace — returns None.  Minting an id
    for such a checkpoint would rename the in-flight epoch's batch-id away
    from its already-applied marker, and the recovery replay would
    double-merge that delta (the exact failure the journal exists to
    prevent).  The id is minted only for checkpoints this function creates."""
    sid_path = fs.join(checkpoint, "_matview_stream_id")
    if fs.exists(spark, sid_path):
        return fs.read_text(spark, sid_path).strip()
    if fs.exists(spark, fs.join(checkpoint, "offsets")):
        return None  # pre-scheme checkpoint: stay on the legacy namespace
    stream_id = uuid.uuid4().hex[:12]
    fs.mkdirs(spark, checkpoint)
    fs.write_text(spark, sid_path, stream_id)
    return stream_id


def maintain_rollup(
    stream: DataFrame,
    path: str,
    spec: RollupSpec,
    checkpoint: str,
    partition_key: str | None = None,
    query_name: str = "matview",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Attach a rollup-maintenance sink to a streaming DataFrame.

    Returns the started query; callers own await/stop.  ``trigger`` passes
    through to ``DataStreamWriter.trigger`` — default is drain-and-stop
    (``{"availableNow": True}``); pass e.g. ``{"processingTime": "1
    minute"}`` for a continuously-running view.  ``epoch_id`` is Spark's
    replay-stable micro-batch id; combined with the checkpoint-scoped
    stream identity it forms the merge batch_id, so checkpoint-recovery
    replays are no-ops while a RESET checkpoint (or a second view over the
    same rollup path) gets its own marker namespace instead of colliding
    with old ``_applied_batches`` entries.
    """
    stream_id = _stream_identity(stream.sparkSession, checkpoint)
    prefix = query_name if stream_id is None else f"{query_name}-{stream_id}"

    def fold(batch: DataFrame, epoch_id: int) -> None:
        refresh_rollup(
            batch.sparkSession,
            batch,
            path,
            spec,
            batch_id=f"{prefix}-{epoch_id}",
            partition_key=partition_key,
        )

    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
