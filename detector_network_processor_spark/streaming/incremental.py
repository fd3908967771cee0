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

Exactly-once caveat: state/output writes are plain parquet appends; a
crash between the output append and the state overwrite can re-emit the
last batch's groups on replay. Production would put both writes in one
transactional table format; this container has none, so the caveat is
documented instead of hidden.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..constants import MAX_TIME_NS, SIMPLE_WINDOW_NS
from ..operators.coincidence import cluster_coincidences

HIT_COLS = ["hash", "start", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h"]


def _last_start(col: str = "events") -> F.Column:
    """Latest constituent start of a group — the growth horizon of its
    session (new events within ``gap`` of it could still join)."""
    return F.array_max(F.transform(col, lambda e: e["start"]))


def process_increment(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    out_path: str,
    criterion: str = "physics",
    gap_ns: int | None = None,
    watermark_ns: int = 10_000_000_000,
    final: bool = False,
) -> None:
    """Cluster one increment: (batch rows ∪ carried open rows) → emit
    closed groups to ``out_path``, overwrite ``state_path`` with the open
    tail. ``final=True`` flushes everything (end of stream)."""
    if gap_ns is None:
        gap_ns = int(math.ceil(MAX_TIME_NS)) if criterion == "physics" else SIMPLE_WINDOW_NS

    hits = batch.select(*HIT_COLS)
    if os.path.exists(state_path):
        hits = hits.unionByName(spark.read.parquet(state_path).select(*HIT_COLS))
    hits = hits.persist()
    if hits.isEmpty():
        hits.unpersist()
        return

    l1 = cluster_coincidences(hits, stations=None, criterion=criterion).withColumn(
        "_last", _last_start()
    )
    l1 = l1.persist()

    if final:
        closed, open_rows = l1, None
    else:
        # Sessions are disjoint start-time intervals, so "still growable"
        # is a pure threshold on the latest constituent start.
        horizon = l1.agg(F.max("_last")).collect()[0][0] - watermark_ns  # O(1) driver row
        closed = l1.filter(F.col("_last") + gap_ns < horizon)
        open_groups = l1.filter(F.col("_last") + gap_ns >= horizon)
        thr_row = open_groups.agg(F.min("start")).collect()[0][0]  # O(1)
        open_rows = hits.filter(F.col("start") >= thr_row) if thr_row is not None else None

    closed.drop("_last").write.mode("append").parquet(out_path)
    if open_rows is not None:
        # range-shard the carried state by time so the next increment's
        # scan parallelizes even when the open tail is large (one file per
        # non-empty range; a small tail compacting to one file is correct)
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        open_rows.repartitionByRange(n_parts, F.col("start")).write.mode("overwrite").parquet(
            state_path + "_next"
        )
        _swap_dir(state_path)
    elif os.path.exists(state_path):
        _clear_state(spark, state_path)
    l1.unpersist()
    hits.unpersist()


def _swap_dir(state_path: str) -> None:
    import shutil

    if os.path.exists(state_path):
        shutil.rmtree(state_path)
    os.rename(state_path + "_next", state_path)


def _clear_state(spark: SparkSession, state_path: str) -> None:
    import shutil

    shutil.rmtree(state_path, ignore_errors=True)


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
    append those groups to the output."""
    if not os.path.exists(state_path):
        return
    empty = spark.createDataFrame([], spark.read.parquet(state_path).select(*HIT_COLS).schema)
    process_increment(
        spark, empty, state_path, out_path, criterion=criterion, gap_ns=gap_ns, final=True
    )
