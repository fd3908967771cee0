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


def _index_exists(spark, path: str) -> bool:
    """Probe the band-index path through the Hadoop FileSystem API so
    non-local stores (HDFS/S3A — the stated 100 TB ingest posture) are
    detected too. A driver-local ``os.path.isdir`` would always be false there
    and the new-vs-history join would be silently skipped, dropping every
    historical duplicate pair."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


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


# --------------------------------------------------------------------------
# Incremental NEAR-dup against a persistent MinHash index — the crawl-
# ingest posture at 100 TB: each new batch of documents is checked against
# everything already ingested WITHOUT reprocessing the historical corpus.
# The index is an append-only parquet dataset of LSH band rows partitioned
# by ingest batch; per increment the work is O(batch + colliding buckets),
# never O(corpus). Same replay-idempotent versioned-directory discipline
# as streaming/incremental.py (both writes keyed by the foreachBatch id).
# --------------------------------------------------------------------------


def process_neardup_increment(
    spark,
    batch_docs: DataFrame,
    index_path: str,
    out_path: str,
    batch_id: int,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> None:
    """One increment: signatures for ``batch_docs`` collide against the
    historical band index AND against each other; pairs with estimated
    Jaccard >= ``threshold`` land in ``out_path/batch_id=N`` and the new
    band rows are appended as ``index_path/ingest_batch=N``. Replays of a
    batch_id overwrite (not duplicate) both directories."""
    import os

    from ..operators.dedup import MINHASH_K, band_rows, minhash_lsh_pairs, minhash_signatures

    sigs = minhash_signatures(
        batch_docs.select(id_col, text_col), id_col=id_col, text_col=text_col, portable=portable
    ).localCheckpoint(eager=True)
    # new_bands is NOT checkpointed: each band row carries the whole
    # 64-slot signature array, so materializing it stores the signature
    # table 16x over and pays a dedicated job per batch — while both
    # consumers (history join, index write) recompute it from the
    # checkpointed sigs with one cheap codegen explode each
    new_bands = band_rows(sigs, id_col=id_col, portable=portable)

    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    est = F.round(agree / float(MINHASH_K), 6)

    # new-vs-new (within the batch); sigs is already checkpointed above,
    # so the defensive re-checkpoint inside minhash_lsh_pairs (a whole
    # job copying every signature block, once per ingest batch) is skipped
    intra = minhash_lsh_pairs(
        sigs, id_col=id_col, portable=portable, materialized=True
    ).filter(F.col("est_jaccard") >= threshold)

    # new-vs-history: bucket equi-join against index batches OLDER than
    # this one (replay-safe: a re-run of batch N sees the same history)
    pairs = intra
    if _index_exists(spark, index_path):
        hist = (
            spark.read.parquet(index_path)
            .filter(F.col("ingest_batch") < batch_id)
            .select(
                F.col(id_col).alias("doc_a"),
                F.col("signature").alias("sig_a"),
                "band",
                "bhash",
            )
        )
        nb = new_bands.select(
            F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b"), "band", "bhash"
        )
        cross = (
            hist.join(nb, ["band", "bhash"])
            .filter(F.col("doc_a") != F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
            .select("doc_a", "doc_b", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
        )
        pairs = intra.unionByName(cross)

    pairs.write.mode("overwrite").parquet(os.path.join(out_path, f"batch_id={batch_id}"))
    # the ingest_batch column comes from the partition DIRECTORY name at
    # read time — writing it into the files too would collide on discovery
    new_bands.write.mode("overwrite").parquet(
        os.path.join(index_path, f"ingest_batch={batch_id}")
    )


def incremental_neardup_query(
    docs: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a streaming document DataFrame into the incremental near-dup
    checker. Returns the unstarted DataStreamWriter."""
    spark = docs.sparkSession

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_increment(
            spark, batch_df, index_path, out_path, batch_id,
            threshold=threshold, id_col=id_col, text_col=text_col,
        )

    return docs.writeStream.foreachBatch(fb).option("checkpointLocation", checkpoint_dir)
