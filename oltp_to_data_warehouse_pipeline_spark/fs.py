"""Hadoop-FileSystem-backed path utilities.

Every stateful operator in this engine (corpus ingest's dedup anti-join,
the rollup merge journal, upsert bucket stores, CDC warehouse dirs) needs
"does this table exist / what data files does it hold / write a tiny marker
file" primitives.  Driver-local ``os.path`` answers those questions only for
``file://`` paths; on ``s3a://`` or ``hdfs://`` it silently answers "no",
which turns idempotence guards into no-ops (round-2 advisor finding,
ADVICE.md item 1).  These helpers resolve every path through the JVM's
``org.apache.hadoop.fs.FileSystem`` — the same abstraction Spark's own
writers use — so the contracts hold on any scheme the cluster can reach.

All functions take the live ``SparkSession`` because the FileSystem handle
comes from the JVM's Hadoop configuration (credentials, scheme
registrations); there is deliberately no module-level cached session.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) pair for ``path`` under the session's Hadoop conf."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def is_hidden_name(name: str) -> bool:
    """Spark/Hadoop convention: _ and . prefixed entries are metadata
    (_SUCCESS, _batches, .crc, staging dirs), not data — EXCEPT partition
    directories (`col=value`), which Spark's own file index keeps even when
    the partition column name starts with an underscore (e.g. the upsert
    store's ``__bucket=0`` dirs)."""
    return name.startswith(("_", ".")) and "=" not in name


def has_data_files(spark: SparkSession, path: str) -> bool:
    """True when ``path`` exists and holds at least one non-hidden entry —
    the "does this table already have data" predicate that gates
    read-before-merge / anti-join paths."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return False
    for status in fs.listStatus(p):
        if not is_hidden_name(status.getPath().getName()):
            return True
    return False


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def delete(spark: SparkSession, path: str, recursive: bool = True) -> None:
    fs, p = _fs_path(spark, path)
    fs.delete(p, recursive)


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Rename src -> dst (the filesystem's atomic primitive on HDFS/local).
    Returns False when the filesystem refuses (e.g. dst exists on HDFS)."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    return bool(fs.rename(s, d))


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file (overwrite-safe, parents auto-created)."""
    fs, p = _fs_path(spark, path)
    fs.create(p, True).close()


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file (marker/journal scale — not a data path)."""
    fs, p = _fs_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    jvm = spark.sparkContext._jvm
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def data_file_inventory(spark: SparkSession, path: str) -> str:
    """Fingerprint of a table's committed data files (path relative to the
    table root + size, sorted) — directory metadata only, no data reads.
    Hidden path components (``_batches``, ``.staging`` …) are excluded at
    every depth, matching the os.walk pruning this replaces."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return ""
    base = fs.makeQualified(p).toString().rstrip("/")
    entries = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        status = it.next()
        full = status.getPath().toString()
        rel = full[len(base) + 1 :] if full.startswith(base + "/") else full
        if any(is_hidden_name(part) for part in rel.split("/")):
            continue
        entries.append(f"{rel}:{status.getLen()}")
    return "\n".join(sorted(entries))


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Sorted child entry names of a directory; empty when absent.
    Directory metadata only — the caller filters (partition dirs, markers)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(s.getPath().getName() for s in fs.listStatus(p))


def join(*parts: str) -> str:
    """URI-safe path join ('/' separator, no scheme mangling)."""
    out = parts[0].rstrip("/")
    for part in parts[1:]:
        out += "/" + part.strip("/")
    return out
