"""Custom stateful streaming operators (applyInPandasWithState).

The CDC/ingest path needs one genuinely *stateful* primitive that windows
and foreachBatch upserts cannot express: streaming first-seen deduplication
— emit each key's first arrival exactly once across the whole stream, not
once per micro-batch.  (Spark's built-in ``dropDuplicates`` on a stream
keeps unbounded state with no per-key control; here state is explicit and
TTL-able.)

At scale, state lives in the state store (RocksDB-backed on clusters),
partitioned by the grouping key — the same shuffle as any keyed aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_first_seen(sdf: DataFrame, key_cols: list[str]) -> DataFrame:
    """Emit exactly one row per key over the lifetime of the stream.

    Deterministic representative: the lexicographically smallest row of the
    key's first micro-batch (sorted over all columns).  State per key is a
    single flag; dedup across restarts comes from the checkpointed state
    store.  Batch DataFrames are rejected by Spark (stateful ops are
    streaming-only) — use ``operators.dedup.exact_dedup`` there.
    """
    schema = sdf.schema

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(by=list(pdf.columns)).head(1)
            if first is None:
                first = cand
            else:
                first = (
                    pd.concat([first, cand]).sort_values(by=list(pdf.columns)).head(1)
                )
        if first is not None:
            state.update((1,))
            yield first

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    sdf: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup: drop repeats of a key that arrive
    within the watermark horizon (`dropDuplicatesWithinWatermark`).

    The complement of `dedup_first_seen`: state per key is EVICTED once the
    watermark passes, so memory is rate × horizon instead of one flag per
    key forever — the right trade for at-least-once sources (Kafka
    redeliveries land within seconds; a key legitimately recurring a day
    later is NOT a duplicate).  On batch inputs falls back to plain
    dropDuplicates, which makes the batch result the semantics oracle for
    within-horizon streams.
    """
    if not sdf.isStreaming:
        return sdf.dropDuplicates(key_cols)
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
