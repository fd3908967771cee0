"""Incremental micro-batch coincidence clustering — the SCALE path for the
§2.5 operator in streaming mode.

Why not ``session_window``: a streaming session window needs a companion
grouping key, and the coincidence buffer is one logical cross-station
stream, so that key is a constant — every session-state update then
serializes through ONE state-store partition (the scale killer the
round-1 review flagged at streaming/coincidence.py). Chaining a sharded
per-time-cell session stage into a stitching stage does not work either:
Spark supports neither a second ``withWatermark`` feeding a downstream
stateful operator (min-policy watermark deadlock) nor a global session
aggregation, and session intervals cannot extend backward from the
watermarked column, which exact boundary stitching would need.

The Spark-first resolution is *incremental batch*: ``foreachBatch`` runs
the already-distributed BATCH operator (range-shuffle sessionization with
O(#partitions) boundary union-find + Arrow replay kernel,
operators/coincidence.py) over ``new micro-batch rows ∪ carried open
tail``, emits every group that can no longer grow, and carries forward
only the open tail — the rows of sessions still within
``gap + watermark`` of the newest event. Per batch:

- heavy work (sessionize + kernel) is fully distributed — the same plan
  the batch engine runs, over (batch + tail) rows;
- driver work is two scalar aggregates (horizon, open threshold);
- carried state is a parquet dataset written by the shuffle's own
  partitioning — sharded storage, no single-partition state store.

Late-data semantics match the REFERENCE more closely than the
session-window path: an event arriving later than the watermark horizon
does not get dropped — it opens a fresh group (exactly
src/analysis/coincidencefilter.cpp:103-109 / SURVEY §2.7 W4), it just can
no longer join an already-emitted group.

Replay safety (exactly-once output without a transactional table format):
both writes are keyed by the foreachBatch ``batch_id``, which Spark
redelivers UNCHANGED when a crashed batch re-runs —

- output goes to ``out_path/batch_id=N/`` with mode=overwrite (the
  standard idempotent-foreachBatch pattern; readers see one partition
  directory per batch and ``spark.read.parquet(out_path)`` surfaces
  ``batch_id`` as a discovered partition column);
- state is VERSIONED: batch N reads the newest ``state_path/vM`` with
  M < N and overwrites ``state_path/vN``; versions older than N-1 are
  pruned only after vN lands. A replay of batch N therefore re-reads
  exactly the pre-N state and overwrites (not duplicates) both its
  output directory and its state version.

A production deployment on a transactional format gets the same guarantee
in one commit; this layout reproduces it with directory-granularity
atomicity (parquet dir overwrite + post-write prune).
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..constants import MAX_TIME_NS, SIMPLE_WINDOW_NS
from ..operators.coincidence import cluster_coincidences
from .overlap import run_overlapped

HIT_COLS = ["hash", "start", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h"]


def _last_start(col: str = "events") -> F.Column:
    """Latest constituent start of a group — the growth horizon of its
    session (new events within ``gap`` of it could still join)."""
    return F.array_max(F.transform(col, lambda e: e["start"]))


def _state_versions(state_path: str) -> list[int]:
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in os.listdir(state_path):
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def _version_dir(state_path: str, version: int) -> str:
    return os.path.join(state_path, f"v{version:012d}")


def process_increment(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    out_path: str,
    batch_id: int,
    criterion: str = "physics",
    gap_ns: int | None = None,
    watermark_ns: int = 10_000_000_000,
    final: bool = False,
) -> None:
    """Cluster one increment: (batch rows ∪ newest state version older
    than ``batch_id``) → overwrite ``out_path/batch_id=N`` with the closed
    groups and ``state_path/vN`` with the open tail. Idempotent under
    foreachBatch replay (same ``batch_id`` → same input state → same two
    overwrites). ``final=True`` flushes everything (end of stream)."""
    if gap_ns is None:
        gap_ns = int(math.ceil(MAX_TIME_NS)) if criterion == "physics" else SIMPLE_WINDOW_NS

    prior = [v for v in _state_versions(state_path) if v < batch_id]
    hits = batch.select(*HIT_COLS)
    if prior:
        hits = hits.unionByName(
            spark.read.parquet(_version_dir(state_path, prior[-1])).select(*HIT_COLS)
        )
    hits = hits.persist()
    l1 = cluster_coincidences(hits, stations=None, criterion=criterion).withColumn(
        "_last", _last_start()
    )
    l1 = l1.persist()

    if final:
        if hits.isEmpty():  # once per STREAM (final flush), not per batch
            l1.unpersist()
            hits.unpersist()
            return
        closed, open_rows = l1, None
    else:
        # Sessions are disjoint start-time intervals, so "still growable"
        # is a pure threshold on the latest constituent start. ONE driver
        # action per batch covers all three bookkeeping scalars (the r8
        # verdict counted ~2 extra jobs per replayed micro-batch for the
        # previous separate horizon + threshold collects, plus a per-batch
        # isEmpty probe): group count (empty-batch no-op guard), growth
        # horizon, and the open-tail start threshold. The threshold is
        # conditional on the horizon — itself an aggregate — so the 1-row
        # max(_last) aggregate is broadcast back under the conditional
        # min; building that broadcast doubles as the job that
        # materializes l1's cache.
        mx = l1.agg(F.max("_last").alias("_mx"))
        stats = (
            l1.crossJoin(F.broadcast(mx))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.first("_mx").alias("mx"),
                F.min(
                    F.when(
                        F.col("_last") + F.lit(gap_ns)
                        >= F.col("_mx") - F.lit(watermark_ns),
                        F.col("start"),
                    )
                ).alias("thr"),
            )
            .collect()[0]
        )
        if stats["cnt"] == 0:
            # nothing changed — no writes, so a replay of this id is a no-op too
            l1.unpersist()
            hits.unpersist()
            return
        horizon = stats["mx"] - watermark_ns
        closed = l1.filter(F.col("_last") + gap_ns < horizon)
        open_rows = (
            hits.filter(F.col("start") >= stats["thr"])
            if stats["thr"] is not None
            else hits.limit(0)
        )

    def _write_closed() -> None:
        closed.drop("_last").write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    if open_rows is not None:
        # range-shard the carried state by time so the next increment's
        # scan parallelizes even when the open tail is large (one file per
        # non-empty range; a small tail compacting to one file is correct).
        # Write the version even when empty: the lineage stays continuous,
        # so a replay of batch N+1 always finds vN.
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

        def _write_state() -> None:
            open_rows.repartitionByRange(n_parts, F.col("start")).write.mode(
                "overwrite"
            ).parquet(_version_dir(state_path, batch_id))

        # The two terminal writes are INDEPENDENT jobs (closed reads the
        # persisted l1, the state version reads the persisted hits), so they
        # run overlapped (guide §2.6; same pattern as the near-dup increment,
        # r12 A/B -12.5%): the short state write back-fills executor slots
        # freed by the closed write's straggler tail. run_overlapped joins
        # both futures fail-fast (sibling job groups cancelled on the first
        # failure) and re-raises, so a replay of this batch_id re-overwrites
        # BOTH directories — skip-instead-of-replay would orphan whichever
        # directory committed (contract note in streaming/overlap.py).
        # Pruning stays strictly AFTER the state write landed.
        run_overlapped(spark, {"closed": _write_closed, "state": _write_state})
        # keep the version this batch READ (not blindly batch_id-1: empty
        # batches write no version, so the read one may be older) — a
        # replay of this batch_id must be able to re-read it.
        _prune_versions(state_path, keep_from=prior[-1] if prior else batch_id)
    else:  # final flush — the stream is over, drop all state
        import shutil

        _write_closed()
        shutil.rmtree(state_path, ignore_errors=True)
    l1.unpersist()
    hits.unpersist()


def _prune_versions(state_path: str, keep_from: int) -> None:
    """Drop state versions older than ``keep_from`` (the previous version
    must survive so a replay of the CURRENT batch can still read it)."""
    import shutil

    for v in _state_versions(state_path):
        if v < keep_from:
            shutil.rmtree(_version_dir(state_path, v), ignore_errors=True)


def incremental_cluster_query(
    events: DataFrame,
    out_path: str,
    state_path: str,
    checkpoint_dir: str,
    criterion: str = "physics",
    gap_ns: int | None = None,
    watermark_ns: int = 10_000_000_000,
):
    """Wire a streaming events DataFrame into the incremental clusterer.
    Returns the (unstarted) DataStreamWriter; call ``.start()``/
    ``.trigger(...)`` as needed, and ``flush_incremental_state`` once the
    stream is done to emit the final open tail."""
    spark = events.sparkSession

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        process_increment(
            spark,
            batch_df,
            state_path,
            out_path,
            batch_id=batch_id,
            criterion=criterion,
            gap_ns=gap_ns,
            watermark_ns=watermark_ns,
        )

    return events.writeStream.foreachBatch(fb).option("checkpointLocation", checkpoint_dir)


def flush_incremental_state(
    spark: SparkSession,
    state_path: str,
    out_path: str,
    criterion: str = "physics",
    gap_ns: int | None = None,
) -> None:
    """End-of-stream flush: cluster whatever the state still holds and
    write those groups as one final output batch directory."""
    versions = _state_versions(state_path)
    if not versions:
        return
    latest = _version_dir(state_path, versions[-1])
    empty = spark.createDataFrame([], spark.read.parquet(latest).select(*HIT_COLS).schema)
    process_increment(
        spark, empty, state_path, out_path, batch_id=versions[-1] + 1,
        criterion=criterion, gap_ns=gap_ns, final=True,
    )
