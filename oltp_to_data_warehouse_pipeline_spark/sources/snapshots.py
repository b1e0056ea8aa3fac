"""Versioned table snapshots on plain parquet — poor-man's time travel.

The reference overwrites its warehouse in place; this engine's
reconciliation ops (`table_checksum_orders`, `orders_snapshot_diff`) beg
the question "diff against WHAT?".  Snapshots answer it without an ACID
table format: each publish writes a new immutable ``v=N`` directory under
the table root and then flips a tiny ``_latest`` pointer file — readers
that follow the pointer see an atomic version switch (the pointer write is
the only mutation; data directories are append-only), and any historical
version stays queryable until retention removes it.

Layout:

    table/
      _latest            <- text file: "3"
      v=1/ ... parquet
      v=2/ ... parquet
      v=3/ ... parquet

All path state goes through the Hadoop FileSystem API (fs.py), so the
scheme-portability contract matches the rest of the engine.  This is
deliberately NOT a transaction log: one writer at a time (publishes are
serialized by the caller), no schema enforcement beyond parquet's own —
the 20%-of-Delta that costs 2% of the machinery, for pipelines that only
need publish/rollback/diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from oltp_to_data_warehouse_pipeline_spark import fs

_POINTER = "_latest"


def _vdir(table: str, version: int) -> str:
    return fs.join(table, f"v={version}")


def _write_pointer(spark: SparkSession, table: str, version: int) -> None:
    """Pointer swap via the filesystem's atomic primitive: write a temp
    file, then RENAME over the pointer (plain create(overwrite) is
    truncate-then-write — a reader in that window would see an empty file,
    round-3 review finding).  On filesystems where rename refuses to
    replace an existing destination (HDFS), the old pointer is deleted
    first; the brief pointer-missing window that leaves is covered by
    ``latest_version``'s version-scan fallback."""
    tmp = fs.join(table, _POINTER + ".tmp")
    dst = fs.join(table, _POINTER)
    fs.write_text(spark, tmp, str(version))
    if not fs.rename(spark, tmp, dst):
        fs.delete(spark, dst, recursive=False)
        if not fs.rename(spark, tmp, dst):
            raise IOError(f"could not move snapshot pointer for {table!r}")


def latest_version(spark: SparkSession, table: str) -> int | None:
    """The published version the pointer names, or None for an empty table.

    Fallback: a missing/unreadable pointer (mid-swap window on
    rename-cannot-replace filesystems, or a crashed first publish) resolves
    to the highest existing version directory — versions are monotonic, so
    that is the most recently PUBLISHED one except during an in-flight
    rollback's swap window."""
    p = fs.join(table, _POINTER)
    if fs.exists(spark, p):
        content = fs.read_text(spark, p).strip()
        if content.isdigit():
            return int(content)
    committed = [
        v
        for v in list_versions(spark, table)
        if fs.exists(spark, fs.join(_vdir(table, v), "_SUCCESS"))
    ]
    return committed[-1] if committed else None


def publish_snapshot(df: DataFrame, table: str) -> int:
    """Write ``df`` as the next version and flip the pointer to it.

    The data lands fully before the pointer moves, so a crash mid-write
    leaves the previous version live (the half-written ``v=N+1`` dir is
    orphaned and harmless — the next publish overwrites it).  Returns the
    new version number."""
    spark = df.sparkSession
    cur = latest_version(spark, table)
    nxt = 1 if cur is None else cur + 1
    df.write.mode("overwrite").parquet(_vdir(table, nxt))
    _write_pointer(spark, table, nxt)
    return nxt


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a version (default: the one the pointer names)."""
    v = version if version is not None else latest_version(spark, table)
    if v is None:
        raise ValueError(f"snapshot table {table!r} has no published versions")
    path = _vdir(table, v)
    if not fs.exists(spark, path):
        raise ValueError(f"snapshot table {table!r} has no version {v}")
    return spark.read.parquet(path)


def rollback(spark: SparkSession, table: str, version: int) -> None:
    """Point ``_latest`` at an existing older version (data untouched —
    roll forward again by re-pointing or publishing)."""
    if not fs.exists(spark, _vdir(table, version)):
        raise ValueError(f"cannot roll back to missing version {version}")
    _write_pointer(spark, table, version)


def list_versions(spark: SparkSession, table: str) -> list[int]:
    """Existing version numbers, ascending (directory scan, no data read)."""
    jfs, p = fs._fs_path(spark, table)
    if not jfs.exists(p):
        return []
    out = []
    for status in jfs.listStatus(p):
        name = status.getPath().getName()
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def vacuum(spark: SparkSession, table: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` versions — but NEVER the one
    the pointer currently names, even if it is old (a rollback target must
    not be vacuumed out from under readers).  Returns removed versions."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(spark, table)
    live = latest_version(spark, table)
    removable = [v for v in versions[:-keep_last] if v != live]
    for v in removable:
        fs.delete(spark, _vdir(table, v), recursive=True)
    return removable


def schema_drift(
    spark: SparkSession, table: str, old: int, new: int
) -> list[tuple[str, str, str | None, str | None]]:
    """Column-level schema changes between two versions: a list of
    (column, kind, old_type, new_type) with kind ∈ {added, removed,
    type_changed} — the check a publisher runs before flipping the pointer
    when downstream consumers pin schemas.  Footer-only (no data read)."""
    a = {f.name: f.dataType.simpleString() for f in read_snapshot(spark, table, old).schema}
    b = {f.name: f.dataType.simpleString() for f in read_snapshot(spark, table, new).schema}
    out: list[tuple[str, str, str | None, str | None]] = []
    for c in sorted(b.keys() - a.keys()):
        out.append((c, "added", None, b[c]))
    for c in sorted(a.keys() - b.keys()):
        out.append((c, "removed", a[c], None))
    for c in sorted(a.keys() & b.keys()):
        if a[c] != b[c]:
            out.append((c, "type_changed", a[c], b[c]))
    return out


def diff_latest(
    spark: SparkSession, table: str, keys: list[str], against: int | None = None
) -> DataFrame:
    """Row-level diff of the live version against an older one (default:
    the previous version) via ``operators.diff.table_diff`` — added /
    removed / changed per key."""
    from oltp_to_data_warehouse_pipeline_spark.operators.diff import table_diff

    live = latest_version(spark, table)
    if live is None:
        raise ValueError(f"snapshot table {table!r} has no published versions")
    base = against if against is not None else live - 1
    return table_diff(
        read_snapshot(spark, table, base), read_snapshot(spark, table, live), keys=keys
    )
