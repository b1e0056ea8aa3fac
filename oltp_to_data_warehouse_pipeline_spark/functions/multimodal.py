"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Pattern (task brief): media travels as a ``binary`` column plus a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas iterators over ``mapInPandas`` — the only layer where real
codec libraries (Pillow/av/librosa) would plug in.  Real pure-stdlib
codecs for PNG, BMP, WAV and baseline JPEG live in ``functions/codecs.py``
(``png_feature`` / ``bmp_feature`` / ``wav_feature`` / ``jpeg_feature``
satisfy the codec signature directly); ``decode_image`` without a codec
still raises ``NotImplementedError`` — the deliberate seam for formats
this container cannot decode (video, progressive JPEG, HEIC, ...), where
production injects Pillow/av.  Everything Spark-side — schema, batch
iteration, partition sizing, UDF signatures — is real and tested.

Scale notes: media rows are large and variable; the helpers below keep
batches bounded by ROWS not bytes (``maxRecordsPerBatch``) and the
recommended layout is one parquet row-group per few hundred media rows with
the binary column LAST (column pruning skips it when queries touch only
metadata).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),      # png, wav, mp4, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_metadata(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct (size is
    computed; intrinsic fields stay NULL until a real decoder fills them)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("bigint").alias("size_bytes"),
        ),
    )


def fake_decode(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake codec: sha256-seeded pseudo-features in [0,1).

    Stands in for a real decode+embed step so the distributed plumbing is
    testable; swap with Pillow/torchvision in production.
    """
    out: list[float] = []
    seed = data or b""
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
        for i in range(0, len(h) - 3, 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == dim:
                break
        counter += 1
    return out


def decode_image(data: bytes, codec: Callable[[bytes], list[float]] | None = None) -> list[float]:
    """STUB — real image decoding needs Pillow/cv2 (not in this container).

    Pass a codec from ``functions/codecs.py`` (``png_feature``,
    ``bmp_feature``, ``jpeg_feature`` — real pure-stdlib decoders),
    ``codec=fake_decode`` (tests), or a library decoder (production)."""
    if codec is None:
        raise NotImplementedError(
            "no codec given: use functions.codecs (png/bmp/wav/baseline "
            "jpeg, pure stdlib) or inject Pillow/cv2 for other formats; "
            "codec=fake_decode for deterministic tests"
        )
    return codec(data)


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "content",
    dim: int = 8,
    codec: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    ``codec`` defaults to the deterministic fake at ``dim`` dimensions.
    The iterator form keeps memory bounded to one Arrow batch of binary
    payloads at a time regardless of partition size — the shape that holds
    when a partition is 10 GB of media.
    """
    if codec is None:
        codec = lambda b: fake_decode(b, dim)  # noqa: E731

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [codec(bytes(b)) if b is not None else None for b in pdf[binary_col]]
            hashes = [
                hashlib.sha256(bytes(b)).hexdigest() if b is not None else None
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "content_hash": hashes, "feature": feats}
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def fake_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: re-keys the payload with the target dims
    (sha256 stream of the requested byte length, capped at 4·w·h).  Stands in
    for Pillow's ``Image.resize`` so the batch plumbing is testable."""
    want = min(4 * width * height, 1 << 16)
    out = bytearray()
    seed = (data or b"") + width.to_bytes(4, "big") + height.to_bytes(4, "big")
    counter = 0
    while len(out) < want:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return bytes(out[:want])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    binary_col: str = "content",
    codec: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize over ``mapInPandas`` (STUB codec by
    default — swap ``codec`` for a Pillow-backed one in production).

    Output rows carry the new binary plus the realized dimensions, ready for
    :func:`attach_metadata`.  Bounded memory: one Arrow batch of payloads at
    a time, independent of partition size.
    """
    if codec is None:
        codec = fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                codec(bytes(b), width, height) if b is not None else None
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "content": resized,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame ts.

    Pure expression (sequence over duration) — the actual frame grab would
    happen in the downstream mapInPandas decode; here the fan-out itself is
    the Spark-side deliverable.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def audio_chunk_plan(
    df: DataFrame, id_col: str, chunk_ms: int = 30_000, overlap_ms: int = 0
) -> DataFrame:
    """Audio chunking *plan*: one row per (chunk_start_ms, chunk_end_ms).

    The fan-out for ASR/embedding pipelines that process long audio in
    bounded windows (optionally overlapping).  Like frame sampling, the
    chunk boundaries are pure expressions; the decode/resample runs in the
    downstream mapInPandas against the byte ranges.
    """
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap_ms must be < chunk_ms")
    step = chunk_ms - overlap_ms
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    starts = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(step))
    return (
        df.select(F.col(id_col), dur.alias("__dur"), F.explode(starts).alias("chunk_start_ms"))
        .where((F.col("chunk_start_ms") == 0) | (F.col("chunk_start_ms") < F.col("__dur")))
        .select(
            id_col,
            "chunk_start_ms",
            F.least(F.col("chunk_start_ms") + chunk_ms, F.col("__dur")).alias("chunk_end_ms"),
        )
    )
