"""SparkSession factory with scale-oriented defaults.

The engine targets large clusters (100 TB inputs) but is tested on
``local[N]``.  All scale-relevant behavior is expressed via conf, not code:
AQE does runtime partition coalescing / skew-join splitting, broadcast
thresholds make the star joins broadcast-hash, and Arrow is enabled for the
(rare) pandas exchanges used by the vectorized UDF escape hatch.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] test harness; on a real cluster the same
# keys are what an operator would tune (values here are safe there too —
# AQE re-plans shuffle parallelism at runtime from actual stage statistics).
_ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime coalescing of shuffle partitions, skew-join
    # splitting, and join-strategy switching (sort-merge -> broadcast when a
    # side turns out small).  This is the 100-TB safety net.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalesces by BYTES; with the default 1 MiB floor a small-byte but
    # CPU-heavy shuffle (full-row dedup hash-agg, collect_set basket build)
    # collapses to 2-3 partitions and serializes onto 2-3 cores.  A 64 KiB
    # floor keeps such stages wide on the test harness; at cluster scale
    # shuffle partitions are far above either floor, so this is a no-op
    # there (parallelismFirst remains default-true either way).  A
    # controlled n=5 A/B (64 KiB vs 1 MiB, sf0.1) on the sub-second
    # queries that regressed round-2->3 showed <6% difference — that
    # regression was bench sampling noise, not this floor.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # Dimension tables in the star schema are small; let Catalyst broadcast
    # them instead of shuffling the fact table.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # NOT set (round-11 A/B, n=5 min-of-5 with control):
    # spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m — the
    # AQE sort-merge->shuffled-hash rewrite showed no effect outside host
    # noise on the sort-heaviest queries (dup_span_pairs/excision,
    # prefix_filter_near_pairs); the candidate-join sorts it would remove
    # are adjacent to window sorts that remain either way.
    # Arrow for any pandas_udf / toPandas exchange (vectorized, not per-row).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python Data Source filter pushdown (the WARC reader drops filtered
    # records before they cross the Arrow boundary).  Spark default is off.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Partition-overwrite used by the idempotent upsert sink (sources.upsert).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # ANSI off: the reference's cleaning semantics are permissive casts
    # (non-castable -> NULL, spark_etl.py:34), which is non-ANSI behavior.
    "spark.sql.ansi.enabled": "false",
    # Timestamps in the fixtures are naive; pin a zone for determinism.
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "oltp-to-dw-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster
    pass ``None`` after setting the master externally (spark-submit).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local harness: one shuffle partition per core.  On a cluster this
        # would be ~2-3x total cores; AQE coalesces the excess.  The env
        # override exists for oversized local fixtures (the 1000x decade
        # study): partitions must scale with data so per-task state fits
        # the heap — exactly the sizing rule a real cluster deploy uses.
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        )

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _ENGINE_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
