"""Multimodal column plumbing (SURVEY.md §2.11): opaque binary media
columns with typed metadata, decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` stages.

The real decoders (PIL/ffmpeg/librosa) are NOT in this container — the
decode kernels below are deliberately split so the Spark-side contract
(schemas, batch shapes, partitioning) is real and tested while the
pixel/sample decoding is either a clearly-marked ``NotImplementedError``
or a deterministic fake:

- ``decode_image(..., fake=False)`` raises NotImplementedError where the
  `PIL.Image.open` call would go.
- ``fake=True`` derives deterministic "decoded" metadata + features from
  the bytes themselves (length/checksum-seeded), so the full pipeline is
  exercisable end-to-end in tests and benchmarks.

Scale notes: media bytes stay in executor memory only for the lifetime of
one Arrow batch (bound batch size with
``spark.sql.execution.arrow.maxRecordsPerBatch`` when rows are large);
feature outputs are small fixed-size arrays, so the shuffle after
extraction carries features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("meta", StructType([
            StructField("source", StringType()),
            StructField("declared_width", IntegerType()),
            StructField("declared_height", IntegerType()),
        ])),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("feature_sums", ArrayType(LongType())),
    ]
)

N_FEATURES = 16

# Karp-Rabin checksum over the raw bytes — pure modular arithmetic, so any
# engine (the DuckDB oracle included) can recompute it; an engine-native
# hash (crc32/xxhash) would make the decode stage un-oracle-able.
_CK_BASE = 257
_CK_MOD = 1_000_000_007


def _fake_decode_one(media: bytes) -> tuple[int, int, int, list[float], list[int]]:
    """Deterministic stand-in for the real decoder: dimensions, a 16-dim
    "embedding", and the exact per-slot byte sums (integer domain, for
    cross-engine comparison without float32 round-off)."""
    arr = np.frombuffer(media, dtype=np.uint8)
    ck = 0
    for b in arr.tolist():
        ck = (ck * _CK_BASE + b) % _CK_MOD
    width = 64 + (ck & 0x3FF)
    height = 64 + ((ck >> 10) & 0x3FF)
    if len(arr) == 0:
        feats = [0.0] * N_FEATURES
        sums = [0] * N_FEATURES
    else:
        pad = (-len(arr)) % N_FEATURES
        chunks = np.pad(arr, (0, pad)).reshape(-1, N_FEATURES)
        sums = chunks.sum(axis=0, dtype=np.int64).tolist()
        feats = (chunks.mean(axis=0) / 255.0).astype(np.float32).tolist()
    return width, height, ck, feats, sums


def _real_decode_one(media: bytes):
    """Real image decode behind a soft import: PIL if present (optional
    extra — absent in the CI sandbox, in which case callers get the
    NotImplementedError below and should use fake=True). Features are the
    N_FEATURES per-slot means/sums of the DECODED pixel bytes — the same
    shape contract as the fake decoder, so downstream plumbing is
    identical either way."""
    try:
        import io

        from PIL import Image  # soft import: optional extra
    except ImportError as exc:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg/librosa, not "
            "available in this environment — run with fake=True "
            "for the deterministic test decoder"
        ) from exc
    with Image.open(io.BytesIO(media)) as img:
        width, height = img.size
        arr = np.frombuffer(img.convert("RGB").tobytes(), dtype=np.uint8)
    ck = 0
    for b in arr.tolist():
        ck = (ck * _CK_BASE + b) % _CK_MOD
    pad = (-len(arr)) % N_FEATURES
    chunks = np.pad(arr, (0, pad)).reshape(-1, N_FEATURES)
    sums = chunks.sum(axis=0, dtype=np.int64).tolist()
    feats = (chunks.mean(axis=0) / 255.0).astype(np.float32).tolist()
    return width, height, ck, feats, sums


def decode_media(media_df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract stage over MEDIA_SCHEMA rows.

    ``fake=True`` runs the deterministic byte-domain decoder (the
    oracle-checked path); ``fake=False`` decodes real images via PIL when
    installed and raises ``NotImplementedError`` otherwise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[["media_id", "media", "media_type"]].itertuples(index=False, name=None):
                media_id, media, mtype = int(t[0]), bytes(t[1]), t[2]
                if fake:
                    w, h, ck, feats, sums = _fake_decode_one(media)
                else:
                    w, h, ck, feats, sums = _real_decode_one(media)
                out.append((media_id, mtype, w, h, len(media), ck, feats, sums))
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media_df.mapInPandas(kernel, DECODED_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a media table (utf-8 bytes as the
    opaque payload) so the multimodal path has a deterministic driver-side
    fixture to run against."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("media"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(0).cast("int").alias("declared_width"),
            F.lit(0).cast("int").alias("declared_height"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Resize + frame-sampling stages (the other two mandated multimodal ops).
# Same split as decode: Spark-side plumbing (schemas, Arrow batching,
# map-only shape) is real; pixel work is a deterministic byte-domain fake
# unless PIL is installed (resize) / always fake for video (no ffmpeg).
# --------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        StructField("feature_sums", ArrayType(LongType())),
    ]
)


def resize_media(media_df: DataFrame, target_w: int, target_h: int, fake: bool = False) -> DataFrame:
    """Resize stage over MEDIA_SCHEMA rows -> RESIZED_SCHEMA. ``fake=True``
    runs the deterministic byte-domain resample; ``fake=False`` uses PIL
    when installed (true bilinear resize, features over resized RGB bytes)
    and raises NotImplementedError otherwise."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[["media_id", "media"]].itertuples(index=False, name=None):
                media_id, media = int(t[0]), bytes(t[1])
                if fake:
                    d = _fake_decode_one(media)
                    src_w, src_h = d[0], d[1]
                    arr = np.frombuffer(media, dtype=np.uint8)
                    n = target_w * target_h
                    if len(arr) == 0:
                        res = np.zeros(n, dtype=np.uint8)
                    else:
                        idx = (np.arange(n, dtype=np.int64) * len(arr)) // n
                        res = arr[idx]
                else:
                    try:
                        import io

                        from PIL import Image  # soft import
                    except ImportError as exc:
                        raise NotImplementedError(
                            "real resize requires PIL — run with fake=True"
                        ) from exc
                    with Image.open(io.BytesIO(media)) as img:
                        src_w, src_h = img.size
                        res = np.frombuffer(
                            img.convert("RGB").resize((target_w, target_h)).tobytes(),
                            dtype=np.uint8,
                        )
                pad = (-len(res)) % N_FEATURES
                chunks = np.pad(res, (0, pad)).reshape(-1, N_FEATURES)
                sums = chunks.sum(axis=0, dtype=np.int64).tolist()
                feats = (chunks.mean(axis=0) / 255.0).astype(np.float32).tolist()
                out.append((media_id, src_w, src_h, target_w, target_h, feats, sums))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media_df.mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
        StructField("feature_sums", ArrayType(LongType())),
    ]
)


def sample_frames(media_df: DataFrame, every_n: int = 8, frame_bytes: int = 256) -> DataFrame:
    """Frame-sampling stage for video media -> FRAME_SCHEMA, one row per
    SAMPLED frame (every ``every_n``-th). The byte stream is treated as
    consecutive ``frame_bytes`` frames (the deterministic stand-in for an
    ffmpeg demux, which this container cannot run); per-frame features are
    the same slot statistics as decode. Map-only explode: output rows carry
    fixed-size features, never frame payloads — the shuffle after sampling
    is feature-sized at any corpus scale."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[["media_id", "media"]].itertuples(index=False, name=None):
                media_id, media = int(t[0]), bytes(t[1])
                arr = np.frombuffer(media, dtype=np.uint8)
                n_frames = max(1, (len(arr) + frame_bytes - 1) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    fr = arr[fi * frame_bytes:(fi + 1) * frame_bytes]
                    pad = (-len(fr)) % N_FEATURES
                    chunks = np.pad(fr, (0, pad)).reshape(-1, N_FEATURES) if len(fr) else np.zeros((1, N_FEATURES), dtype=np.uint8)
                    sums = chunks.sum(axis=0, dtype=np.int64).tolist()
                    feats = (chunks.mean(axis=0) / 255.0).astype(np.float32).tolist()
                    out.append((media_id, fi, n_frames, len(fr), feats, sums))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media_df.mapInPandas(kernel, FRAME_SCHEMA)
