"""Streaming exact deduplication (SURVEY.md §2.11 dedup family, online
mode): drop repeated documents/events as they arrive, with bounded state.

Two state disciplines, both built on Spark's native dedup operators so the
state lives in the (RocksDB-capable) state store, not user code:

- ``stream_dedup_exact``: ``dropDuplicates`` on the key columns — state
  grows with #distinct keys and never expires. Right for bounded key
  domains (station ids, config keys).
- ``stream_dedup_within_watermark``: ``dropDuplicatesWithinWatermark`` —
  duplicates are only suppressed while their event time is above the
  watermark, so state is bounded by the watermark horizon regardless of
  key cardinality. Right for unbounded domains (document/content hashes
  at crawl scale) where re-ingesting a months-old duplicate is acceptable
  or handled by a downstream batch dedup pass; this is the
  stream-then-compact posture every 100 TB ingest pipeline lands on.

The content key for document streams should be a digest column
(``xxhash64(text)`` / ``md5``) computed BEFORE the dedup operator so state
stores 8-16 bytes per key, never the payload.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_content_key(df: DataFrame, text_col: str = "text", key_col: str = "content_key") -> DataFrame:
    """Attach the 8-byte content digest used as the dedup state key."""
    return df.withColumn(key_col, F.xxhash64(F.col(text_col)))


def stream_dedup_exact(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unbounded-state exact dedup on ``key_cols`` (first arrival wins)."""
    return df.dropDuplicates(key_cols)


def stream_dedup_within_watermark(
    df: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermark-bounded exact dedup: suppresses duplicates arriving within
    the watermark horizon of the first occurrence; state for keys older
    than the watermark is evicted by the engine. ``event_time_col`` must be
    a timestamp column; ``delay`` is the lateness bound (also the duplicate
    horizon)."""
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(key_cols)
