"""WARC (Web ARChive) data source — crawl ingestion for the corpus pipeline.

Common Crawl and most web-scale corpus dumps ship as WARC (ISO 28500):
concatenated records, each a ``WARC/1.x`` header block + payload.  Spark has
no native WARC reader, so crawls usually detour through a preprocessing job;
this module closes that gap with a Spark 4 **Python Data Source** — the
sanctioned extension point for formats the JVM can't read — so a crawl dump
is directly queryable:

    from oltp_to_data_warehouse_pipeline_spark.sources.warc import WarcDataSource
    spark.dataSource.register(WarcDataSource)
    docs = spark.read.format("warc").load("/crawl/segments/")

Scale shape: one input partition PER FILE (WARC members are not
splittable mid-stream without an index; Common Crawl segments are ~1 GB
gzipped, a healthy task size), records streamed — memory is bounded by one
record's payload, never a whole file.  ``.warc.gz`` works through Python's
multi-member gzip support (per-record gzip members, the Common Crawl
layout).  The reader is executor-side pure Python over Arrow batches —
the slow path by design, but parse-once: land the output as parquet and
every downstream query is columnar.

Record parsing follows WARC/1.0-1.1 (header block terminated by CRLF CRLF,
``Content-Length`` octets of payload, two CRLFs between records).  Records
with a malformed header block stop the file with a clear error rather than
silently resynchronizing (crawl integrity beats recall — a corrupt segment
should be re-fetched, not half-read).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("source_file", T.StringType()),
    ]
)

_CRLF = b"\r\n"


def iter_warc_records(stream: io.BufferedIOBase) -> Iterator[dict]:
    """Yield parsed records from a raw WARC byte stream.

    Pure function of the stream — used by the Spark reader and directly
    unit-testable without a SparkSession.
    """
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        while line in (_CRLF, b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (_CRLF, b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"WARC record missing/invalid Content-Length: {headers}") from e
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError(
                f"truncated WARC payload: expected {length} bytes, got {len(payload)}"
            )
        yield {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload,
        }


def _open(path: str) -> io.BufferedIOBase:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # multi-member streams read seamlessly
    return open(path, "rb")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _require_local(path: str) -> str:
    """The WARC readers run PURE PYTHON on executors — no JVM gateway, so
    the Hadoop FileSystem API (fs.py) is not reachable from the read path.
    Paths must be driver+executor-visible POSIX paths (local disk, NFS, or
    a FUSE mount of the object store).  Fail fast on URI schemes instead of
    surfacing as FileNotFoundError inside executor tasks."""
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"warc source reads through local POSIX I/O; {path!r} has a URI "
            "scheme — mount the store (FUSE/NFS) or land segments locally"
        )
    return path.removeprefix("file://")


def _list_warc_files(path: str, missing_ok: bool = False) -> list[str]:
    """Sorted .warc/.warc.gz listing under ``path`` (or the file itself).
    Shared by the batch and streaming readers so the suffix rule cannot
    diverge between them."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".warc", ".warc.gz"))
        )
    if os.path.exists(path):
        return [path]
    return [] if missing_ok else [path]


def _read_partition(partition: _FilePartition, type_filter: str | None = None):
    """Parse one WARC file into WARC_SCHEMA-ordered row tuples — the single
    row-emission point for both readers (a schema change edits exactly
    here)."""
    with _open(partition.path) as stream:
        for rec in iter_warc_records(stream):
            if type_filter is not None and rec["warc_type"] != type_filter:
                continue
            yield (
                rec["warc_type"],
                rec["record_id"],
                rec["target_uri"],
                rec["warc_date"],
                rec["content_type"],
                rec["content_length"],
                rec["payload"],
                partition.path,
            )


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path: .load('/dir/or/file')")
        self.path = _require_local(self.path)
        self.type_filter: str | None = None

    def partitions(self):
        files = _list_warc_files(self.path)
        if not files:
            raise ValueError(f"no .warc/.warc.gz files under {self.path!r}")
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        yield from _read_partition(partition, self.type_filter)


class WarcReaderWithPushdown(WarcReader):
    """`WarcReader` + filter pushdown.  Separate class because Spark REFUSES
    any reader that defines ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false (rather than
    ignoring it), so the capability must be attached only when the session
    has the conf on — `WarcDataSource.reader` picks the class at plan
    time."""

    def pushFilters(self, filters):
        """Push ``warc_type = '<literal>'`` into the record parser: filtered
        records are dropped before their payload crosses the Arrow boundary
        (a crawl segment is mostly request/metadata records when you only
        want responses).  Everything else stays with Spark.  The filter is
        re-returned so Spark still applies it post-scan — pushdown here is
        an optimization, never a correctness dependency."""
        from pyspark.sql.datasource import EqualTo

        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) == ("warc_type",)
                and isinstance(f.value, str)
            ):
                self.type_filter = f.value
        return filters


class WarcStreamReader(DataSourceStreamReader):
    """Streaming tail of a crawl-segment directory: each micro-batch picks
    up WARC files that appeared since the last committed offset.

    Offset model: a NAME boundary — ``{"files": n, "last": <path>}`` means
    "every file with path <= last is covered, and there were n of them".
    ``partitions(start, end)`` selects by name (start.last < f <=
    end.last), NOT by position, so a batch's coverage is exactly what its
    committed offset says even if the listing shifts between
    ``latestOffset()`` and ``partitions()`` (a positional model would read
    a late-landing out-of-order file in place of a listed one and commit
    coverage of a file never ingested).  Crawl pipelines append segments
    with monotonically increasing names (Common Crawl's layout); a file
    that lands with a name INSIDE the committed boundary — out-of-order
    landing or deletion of processed segments — changes the count below
    the boundary and is refused loudly rather than silently skipped.
    One input partition per new file — same unsplittable-member economics
    as the batch reader.  Files must be fully written before they appear
    under the path (write-then-rename, the standard landing pattern).
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path: .load('/dir')")
        self.path = _require_local(self.path)

    def _listing(self) -> list[str]:
        return _list_warc_files(self.path, missing_ok=True)

    def initialOffset(self) -> dict:
        return {"files": 0, "last": ""}

    def latestOffset(self) -> dict:
        files = self._listing()
        return {"files": len(files), "last": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        files = self._listing()
        covered = [f for f in files if f <= start["last"]] if start["last"] else []
        if len(covered) != start["files"]:
            raise ValueError(
                f"WARC listing changed INSIDE committed offset {start}: "
                f"{len(covered)} files on disk at or below the boundary, "
                f"{start['files']} committed — segments must land with "
                "sort-increasing names and processed segments must not be "
                "deleted while the stream runs"
            )
        lo, hi = start["last"], end["last"]
        return [_FilePartition(f) for f in files if (not lo or f > lo) and f <= hi]

    def read(self, partition: _FilePartition):
        yield from _read_partition(partition)

    def commit(self, end: dict) -> None:  # type: ignore[override]
        pass  # progress is tracked by Spark's own offset log


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` / ``spark.readStream.format("warc")``
    — register with ``spark.dataSource.register(WarcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema) -> WarcReader:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        enabled = (
            s is not None
            and s.conf.get("spark.sql.python.filterPushdown.enabled", "false") == "true"
        )
        return (WarcReaderWithPushdown if enabled else WarcReader)(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def write_warc(records: list[dict], path: str, compress: bool = False) -> None:
    """Tiny WARC writer (fixture generator / round-trip testing): each record
    needs warc_type, record_id, payload; other headers optional."""
    out: io.BufferedIOBase
    raw = io.BytesIO()
    for r in records:
        payload = r["payload"]
        head = [
            b"WARC/1.0",
            f"WARC-Type: {r['warc_type']}".encode(),
            f"WARC-Record-ID: {r['record_id']}".encode(),
            f"Content-Length: {len(payload)}".encode(),
        ]
        for opt, key in (
            ("target_uri", "WARC-Target-URI"),
            ("warc_date", "WARC-Date"),
            ("content_type", "Content-Type"),
        ):
            if r.get(opt):
                head.append(f"{key}: {r[opt]}".encode())
        raw.write(_CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF)
    data = raw.getvalue()
    if compress:
        with gzip.open(path, "wb") as out:
            out.write(data)
    else:
        with open(path, "wb") as out:
            out.write(data)
