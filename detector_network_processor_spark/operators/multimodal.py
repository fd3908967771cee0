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
