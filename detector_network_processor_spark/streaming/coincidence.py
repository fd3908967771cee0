"""Streaming time-coincidence clustering (SURVEY.md §2.5, §2.7).

Spark-first shape: ``withWatermark`` + built-in ``session_window`` does the
candidate generation (the same gap decomposition as the batch operator —
provably exact because the criterion's hard time cutoff bounds every edge);
``collect_list`` gathers each session's hits; the exact per-session replay
core (``_session_rows_to_l1``, shared with the batch kernel and the golden
model) runs as an Arrow-batched ``mapInPandas`` stage over the collected
arrays — one Python invocation per Arrow batch, no row-at-a-time
``BatchEvalPython`` in the streaming plan.

Time-unit note: Spark timestamps are microsecond-precision, but the
criterion works in exact int64 nanoseconds. The stream relabels ns as "us"
(``timestamp_micros(start_ns)``) so session grouping happens on exact
integers; the gap interval is expressed in the same relabeled unit, with
+1 because session_window merges on strict interval overlap while the
criterion's cutoff is inclusive (|dt| <= gap).

Watermark semantics: late events beyond the watermark are dropped — a
STRONGER guarantee than the reference, which silently opens fresh groups
for late arrivals (SURVEY.md §2.7 W4, documented divergence).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..constants import MAX_TIME_NS, SIMPLE_WINDOW_NS
from ..operators.coincidence import L1_SCHEMA, _session_rows_to_l1
from ..operators.golden import Hit, compare_physics, compare_simple

import math
import warnings

_L1_COLS = [f.name for f in L1_SCHEMA.fields]


def _resolve_collected(criterion: str):
    """mapInPandas kernel over (hits array<struct>) session rows: the same
    exact replay core the batch operator and the golden model share
    (``_session_rows_to_l1``), invoked once per Arrow batch instead of once
    per row — replaces the former row-at-a-time ``F.udf`` resolver."""
    compare = compare_physics if criterion == "physics" else compare_simple

    def kernel(iterator):
        import pandas as pd

        for pdf in iterator:
            out: list[tuple] = []
            for hits_rows in pdf["hits"]:
                hits = [
                    Hit(
                        hash=int(r["hash"]),
                        start=int(r["start"]),
                        end=int(r["end"]),
                        time_acc=int(r["time_acc"]),
                        ublox_counter=int(r["ublox_counter"]),
                        fix=int(r["fix"]),
                        lat=float(r["lat"]),
                        lon=float(r["lon"]),
                        h=float(r["h"]),
                    )
                    for r in hits_rows
                ]
                out.extend(_session_rows_to_l1(None, hits, compare))
            if out:
                yield pd.DataFrame(out, columns=_L1_COLS)

    return kernel


#: rows-per-trigger bound above which the constant-key convenience path
#: refuses to build (its session state serializes onto ONE state
#: partition); callers declaring a higher expected rate must use
#: ``stream_cluster_coincidences_scaled``.
SESSION_PATH_MAX_ROWS_PER_TRIGGER = 1_000_000


def stream_cluster_coincidences(
    events: DataFrame,
    criterion: str = "physics",
    gap_ns: int | None = None,
    watermark_ns: int = 10_000_000_000,
    expected_rows_per_trigger: int | None = None,
) -> DataFrame:
    """events: streaming DataFrame with hash,start,end,time_acc,
    ublox_counter,fix,lat,lon,h (start/end int64 ns).

    ``watermark_ns`` is the late-data tolerance in REAL event-time
    nanoseconds (default 10 s). Internally the stream relabels ns as µs for
    exact-integer session grouping, so the delay is converted to the
    relabeled domain here — callers never see the 1000× scaling.

    LOW-VOLUME convenience path: building this plan always emits a
    ``UserWarning`` pointing to ``stream_cluster_coincidences_scaled``
    (the sharded exact-equivalent), and REFUSES (``ValueError``) when
    ``expected_rows_per_trigger`` exceeds
    ``SESSION_PATH_MAX_ROWS_PER_TRIGGER`` — the constant session key
    funnels all state updates through one state partition.

    NOTE: building the plan sets the session-global conf
    ``spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition``
    (map-side session pre-merge). The setting persists on the
    SparkSession and applies to every subsequent session_window query in
    it — harmless for those queries (pre-merge is a pure optimization),
    noted here because plan-builders normally don't mutate session state.

    Returns a streaming L1 DataFrame (append mode; sessions emit once the
    watermark passes their gap horizon)."""
    if (
        expected_rows_per_trigger is not None
        and expected_rows_per_trigger > SESSION_PATH_MAX_ROWS_PER_TRIGGER
    ):
        raise ValueError(
            f"stream_cluster_coincidences is the single-state-partition "
            f"convenience path; declared rate {expected_rows_per_trigger} "
            f"rows/trigger exceeds the bound "
            f"{SESSION_PATH_MAX_ROWS_PER_TRIGGER}. Use "
            f"stream_cluster_coincidences_scaled (sharded state, same "
            f"exact semantics)."
        )
    warnings.warn(
        "stream_cluster_coincidences serializes session state onto one "
        "state partition (constant grouping key) — fine at station-network "
        "rates; for high-volume streams use "
        "stream_cluster_coincidences_scaled.",
        UserWarning,
        stacklevel=2,
    )
    if gap_ns is None:
        gap_ns = int(math.ceil(MAX_TIME_NS)) if criterion == "physics" else SIMPLE_WINDOW_NS

    ts = F.timestamp_micros(F.col("start"))  # ns relabeled as us — exact ints
    # 1 real ns == 1 relabeled us: express the ns delay as that many us.
    with_ts = events.withColumn("_ts", ts).withWatermark("_ts", f"{int(watermark_ns)} microseconds")
    # session_window needs a companion grouping key in streaming; the
    # coincidence buffer is one logical stream (cross-station sessions), so
    # the key is a constant and session-state updates serialize onto one
    # state partition. This path is therefore the LOW-VOLUME convenience
    # API (mirrors the reference's single `muon::filter` thread). The scale
    # path is ``stream_cluster_coincidences_scaled`` below
    # (streaming/incremental.py): the distributed batch operator per
    # micro-batch with a carried open tail — same exact semantics, state
    # and compute sharded by the range shuffle. Exact sharding of THIS
    # plan is not expressible in Structured Streaming: bucket keys split
    # boundary sessions, and every stitch mechanism is rejected by Spark —
    # session_window merges anchor on window-END event times (a chained
    # constant-key pass misses merges whenever the later fragment's chain
    # extends past first_hit + gap; verified on 4.1), and
    # applyInPandasWithState/transformWithState are disallowed downstream
    # of a streaming aggregation. What IS available: map-side session
    # pre-merge, which collapses each micro-batch's sessions locally
    # before they reach the single state partition, cutting state-update
    # traffic from O(hits) to O(open sessions) per trigger.
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition", "true"
    )
    return (
        with_ts.withColumn("_k", F.lit(0))
        .groupBy("_k", F.session_window("_ts", f"{gap_ns + 1} microseconds"))
        .agg(
            F.collect_list(
                F.struct("hash", "start", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h")
            ).alias("hits")
        )
        .select("hits")
        .mapInPandas(_resolve_collected(criterion), L1_SCHEMA)
    )


def stream_cluster_coincidences_scaled(
    events: DataFrame,
    out_path: str,
    state_path: str,
    checkpoint_dir: str,
    criterion: str = "physics",
    gap_ns: int | None = None,
    watermark_ns: int = 10_000_000_000,
):
    """The SCALE variant of ``stream_cluster_coincidences`` — same inputs,
    same exact semantics, but state and compute shard across the cluster.

    Delegates to the incremental micro-batch engine
    (streaming/incremental.py): each trigger runs the distributed BATCH
    operator over new rows ∪ carried open tail, emits closed groups to
    ``out_path/batch_id=N/`` and carries the open tail in range-sharded
    parquet state. Use this whenever the stream is more than a single
    executor's worth of events; the session_window path above keeps the
    pure-DataFrame streaming shape but serializes session state onto one
    partition (see the in-function comment for why that is a Structured
    Streaming limit, not a choice).

    Returns the (unstarted) ``DataStreamWriter``; call ``.trigger(...)``/
    ``.start()``, then ``streaming.incremental.flush_incremental_state``
    after end-of-stream to emit the final open tail.
    """
    from .incremental import incremental_cluster_query

    return incremental_cluster_query(
        events,
        out_path,
        state_path,
        checkpoint_dir,
        criterion=criterion,
        gap_ns=gap_ns,
        watermark_ns=watermark_ns,
    )
