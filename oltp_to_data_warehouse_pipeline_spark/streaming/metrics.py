"""Streaming observability: progress capture via StreamingQueryListener.

The reference pipeline runs its Kafka consumer blind (no throughput or lag
accounting anywhere in `mongo_postgres_cdc.py`).  This engine's streams are
Structured Streaming queries, so every micro-batch already emits a progress
event; this module captures those events per query into a bounded in-memory
ring and exposes them as a DataFrame — rows/sec, batch durations, state
size — the numbers an operator alarms on (falling inputRows/sec = upstream
stall; rising batchDuration = falling behind; growing stateRows = watermark
not clearing).

Driver-side by design: progress events are O(1) per BATCH (not per row) and
already summarized by Spark; holding the last N per query is bounded driver
state, exactly like collecting a LIMIT.  For durable history, point
``spark.sql.streaming.metricsEnabled`` / a metrics sink at the same events —
this module is the in-process view.
"""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.listener import StreamingQueryListener

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("process_rows_per_second", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("state_rows", T.LongType()),
    ]
)


class ProgressRecorder(StreamingQueryListener):
    """Keeps the last ``keep`` progress rows per query name.

    Attach with ``spark.streams.addListener(rec)``; detach with
    ``spark.streams.removeListener(rec)`` (always detach in tests — the
    listener outlives the query otherwise).
    """

    def __init__(self, keep: int = 256):
        self.keep = keep
        self._rows: dict[str, deque] = defaultdict(lambda: deque(maxlen=keep))

    # -- listener callbacks ------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(s.numRowsTotal for s in (p.stateOperators or []))
        duration = (p.durationMs or {}).get("triggerExecution", 0)
        # the ring key doubles as the emitted query_name so UNNAMED queries
        # stay attributable (name=None rows would merge every anonymous
        # query into one NULL group in summary(); round-3 review finding)
        key = p.name or str(p.id)
        self._rows[key].append(
            (
                key,
                p.batchId,
                p.timestamp,
                p.numInputRows,
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int(duration or 0),
                int(state_rows),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- accessors ---------------------------------------------------------
    def progress(self, spark: SparkSession, query_name: str | None = None) -> DataFrame:
        """Captured progress as a DataFrame (newest last), optionally for
        one query name."""
        names = [query_name] if query_name else list(self._rows)
        rows = [r for n in names for r in self._rows.get(n, ())]
        return spark.createDataFrame(rows, PROGRESS_SCHEMA)

    def summary(self, spark: SparkSession) -> DataFrame:
        """Per-query rollup of the captured window: batches, rows, mean
        rows/sec, p-ish max batch duration, last state size."""
        from pyspark.sql import functions as F

        p = self.progress(spark)
        return p.groupBy("query_name").agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("num_input_rows").alias("total_rows"),
            F.round(F.avg("process_rows_per_second"), 1).alias("avg_rows_per_sec"),
            F.max("batch_duration_ms").alias("max_batch_ms"),
            # newest batch's state size — F.last over an unordered groupBy
            # is partition-order-nondeterministic (round-3 review finding)
            F.max_by("state_rows", "batch_id").alias("state_rows"),
        )
