"""The core operator: batch time-coincidence clustering (SURVEY.md §2.5).

Reference behavior (src/analysis/coincidencefilter.cpp:60-143): probe each
incoming event against the open-group buffer under a pluggable pairwise
criterion, fold into the first match, transitively merge later matches.

Spark-first decomposition (exact, not approximate):
1. **Candidate generation** — global gap sessionization on ``start`` with
   gap = the criterion's hard time cutoff. Any criterion-valid pair is
   within the cutoff, so no coincidence edge crosses a session boundary;
   feeding sessions independently to the replay kernel is provably
   equivalent to the reference's sequential scan (SURVEY.md §7.3).
2. **Singleton fast path** — sessions of size 1 (the overwhelming majority
   at production event rates) bypass Python entirely: their L1 row is built
   with JVM column expressions. Only multi-event sessions pay the
   Arrow/pandas transfer.
3. **Per-session replay** — ``applyInPandas`` over multi-event sessions runs
   the golden kernel (exact conflicting/true_e/merge bookkeeping). Sessions
   are physics-bounded (stations within 62 km, chains of <=207.9 us gaps),
   so per-group work is small and bounded regardless of total data size.

Criteria: "physics" (C3, WGS84 distance / time-of-flight scoring) or
"simple" (C4, pure 100 us window).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..constants import MAX_TIME_NS, SIMPLE_WINDOW_NS
from .golden import Hit, cluster_hits, compare_physics, compare_simple, groups_to_rows
from .sessionize import sessionize_global_gap

CONSTITUENT_SCHEMA = StructType(
    [
        StructField("hash", LongType()),
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("time_acc", IntegerType()),
        StructField("ublox_counter", IntegerType()),
        StructField("fix", IntegerType()),
    ]
)

L1_SCHEMA = StructType(
    [
        StructField("session_id", LongType()),
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("n", IntegerType()),
        StructField("conflicting", BooleanType()),
        StructField("true_e", IntegerType()),
        StructField("events", ArrayType(CONSTITUENT_SCHEMA)),
    ]
)

_EVENT_COLS = ("hash", "start", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h")


def _session_rows_to_l1(sid: int, hits: list, compare) -> list[tuple]:
    """Rows as tuples in L1_SCHEMA field order — pandas builds a frame from
    tuples measurably faster than from dicts, and this runs per session."""
    rows = groups_to_rows(cluster_hits(hits, compare))
    return [
        (
            sid,
            r["start"],
            r["end"],
            r["n"],
            r["conflicting"],
            r["true_e"],
            [
                (e["hash"], e["start"], e["end"], e["time_acc"], e["ublox_counter"], e["fix"])
                for e in r["events"]
            ],
        )
        for r in rows
    ]


def _resolve_sessions_stream(compare):
    """mapInPandas kernel: rows arrive grouped by session (shuffled on
    session_id, sorted within partitions); sessions may straddle Arrow
    batches, so an explicit carry buffer stitches them. One Python
    invocation per Arrow batch — not per session — and numpy boundary
    slicing instead of pandas.groupby keep per-group overhead amortized
    across the thousands of small physics-bounded sessions."""
    import numpy as np
    import pandas as pd

    cols = ["session_id", "hash", "start", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h"]

    def process_block(arrs, lo, hi, out):
        sid = int(arrs[0][lo])
        hits = [
            Hit(
                hash=int(arrs[1][i]),
                start=int(arrs[2][i]),
                end=int(arrs[3][i]),
                time_acc=int(arrs[4][i]),
                ublox_counter=int(arrs[5][i]),
                fix=int(arrs[6][i]),
                lat=float(arrs[7][i]),
                lon=float(arrs[8][i]),
                h=float(arrs[9][i]),
            )
            for i in range(lo, hi)
        ]
        out.extend(_session_rows_to_l1(sid, hits, compare))

    def kernel(iterator):
        carry: pd.DataFrame | None = None
        for pdf in iterator:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            if len(pdf) == 0:
                continue
            arrs = [pdf[c].to_numpy() for c in cols]
            sids = arrs[0]
            # hold back the trailing session — it may continue in the next batch
            cut = int((sids != sids[-1]).nonzero()[0].max() + 1) if (sids != sids[-1]).any() else 0
            out: list[dict] = []
            if cut:
                bounds = np.flatnonzero(np.concatenate(([True], sids[1:cut] != sids[: cut - 1], [True])))
                for lo, hi in zip(bounds[:-1], bounds[1:]):
                    process_block(arrs, int(lo), int(hi), out)
            carry = pdf.iloc[cut:]
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in L1_SCHEMA.fields])
        if carry is not None and len(carry):
            out = []
            arrs = [carry[c].to_numpy() for c in cols]
            sids = arrs[0]
            bounds = np.flatnonzero(np.concatenate(([True], sids[1:] != sids[:-1], [True])))
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                process_block(arrs, int(lo), int(hi), out)
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in L1_SCHEMA.fields])

    return kernel


def _resolve_pairs_jvm(pairs: DataFrame, criterion: str) -> DataFrame:
    """Exact 2-hit-session resolution as column expressions (no Python).

    Replay semantics for two hits a <= b in (start, hash) order
    (golden.py::cluster_hits): same station -> two singletons (F6);
    otherwise one 1-on-1 criterion verdict — Valid (score > 0) folds them
    into a group with true_e = 1 and conflicting = False, Invalid leaves
    two singletons. score > 0 reduces to ``dt <= MAX_TIME && dt < tof``
    for physics (1 - dt/tof > 0 iff dt < tof in IEEE arithmetic) and
    ``dt <= window`` for simple."""
    from ..constants import C_M_PER_NS, MIN_TOF_NS
    from ..functions.geodesy import straight_distance_col

    agg = pairs.groupBy("session_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "start", "hash", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h"
                )
            )
        ).alias("p")
    )
    e1, e2 = F.col("p")[0], F.col("p")[1]
    dt = (e2["start"] - e1["start"]).cast("double")  # sorted: e2.start >= e1.start
    if criterion == "physics":
        dist = straight_distance_col(
            e1["lat"], e1["lon"], e1["h"], e2["lat"], e2["lon"], e2["h"]
        )
        tof = F.greatest(dist / F.lit(C_M_PER_NS), F.lit(float(MIN_TOF_NS)))
        score_pos = (dt <= F.lit(float(MAX_TIME_NS))) & (dt < tof)
    else:
        score_pos = dt <= F.lit(float(SIMPLE_WINDOW_NS))
    valid = (e1["hash"] != e2["hash"]) & score_pos

    def cons(e):
        return F.struct(
            e["hash"].alias("hash"),
            e["start"].alias("start"),
            e["end"].alias("end"),
            e["time_acc"].alias("time_acc"),
            e["ublox_counter"].alias("ublox_counter"),
            e["fix"].alias("fix"),
        )

    def row(start, end, n, true_e, events):
        return F.struct(
            F.col("session_id").alias("session_id"),
            start.alias("start"),
            end.alias("end"),
            F.lit(n).cast("int").alias("n"),
            F.lit(False).alias("conflicting"),
            F.lit(true_e).cast("int").alias("true_e"),
            events.alias("events"),
        )

    # single pass: a conditional row array + one explode — branching into
    # filter(valid) ∪ filter(~valid) would evaluate the aggregation twice
    out_rows = F.when(
        valid,
        # envelope end of a promoted group = max constituent start
        F.array(row(e1["start"], e2["start"], 2, 1, F.array(cons(e1), cons(e2)))),
    ).otherwise(
        F.array(
            row(e1["start"], e1["end"], 1, 0, F.array(cons(e1))),
            row(e2["start"], e2["end"], 1, 0, F.array(cons(e2))),
        )
    )
    return agg.select(F.explode(out_rows).alias("g")).select("g.*")


def cluster_coincidences(
    events: DataFrame,
    stations: DataFrame | None = None,
    criterion: str = "physics",
    gap_ns: int | None = None,
) -> DataFrame:
    """events: columns hash,start,end,time_acc,ublox_counter,fix(+lat,lon,h).

    If ``stations`` (hash, lat, lon, h) is given, events are enriched via a
    broadcast join (J1 analog — the station dimension is always small
    relative to the fact stream). Returns the L1 table (L1_SCHEMA),
    singletons included (filter ``n >= 2`` for the K1/K2 sink semantics).
    """
    if gap_ns is None:
        gap_ns = int(math.ceil(MAX_TIME_NS)) if criterion == "physics" else SIMPLE_WINDOW_NS
    compare = compare_physics if criterion == "physics" else compare_simple

    if stations is not None:
        events = events.join(
            F.broadcast(stations.select("hash", "lat", "lon", "h")), "hash", "inner"
        )
    ev = events.select(
        F.col("hash").cast("long"),
        F.col("start").cast("long"),
        F.col("end").cast("long"),
        F.col("time_acc").cast("int"),
        F.col("ublox_counter").cast("int"),
        F.col("fix").cast("int"),
        F.col("lat").cast("double"),
        F.col("lon").cast("double"),
        F.col("h").cast("double"),
    )

    # sessionize emits session sizes in the same pass — the singleton fast
    # path below is shuffle-free (sizes via a window would re-shuffle the
    # whole stream on session_id just to count).
    sess = sessionize_global_gap(ev, "start", gap_ns).withColumnRenamed("session_n", "_n")

    singles = sess.filter(F.col("_n") == 1).select(
        F.col("session_id"),
        F.col("start"),
        F.col("end"),
        F.lit(1).cast("int").alias("n"),
        F.lit(False).alias("conflicting"),
        F.lit(0).cast("int").alias("true_e"),
        F.array(
            F.struct(
                F.col("hash"),
                F.col("start"),
                F.col("end"),
                F.col("time_acc"),
                F.col("ublox_counter"),
                F.col("fix"),
            )
        ).alias("events"),
    )

    # 2-hit sessions (the bulk of the multi mass at physical rates) resolve
    # in closed form — one pairwise verdict decides group-vs-two-singletons
    # (a 1-on-1 criterion can only be Valid or Invalid, criterion.cpp:7-14)
    # — so they run as pure column expressions inside whole-stage codegen.
    # Only sessions of n >= 3 pay the Arrow/Python replay.
    pair_path = _resolve_pairs_jvm(sess.filter(F.col("_n") == 2), criterion)

    # Pin the partition count: with a bare repartition(col), AQE coalesces
    # this exchange by BYTES, but the replay kernel is CPU-bound Python —
    # at sf0.1 AQE shrank it to 2 partitions and serialized the stage
    # (measured: the longest tail of the whole query). The byte-size
    # heuristic is wrong whenever downstream cost is per-row Python work.
    n_part = events.sparkSession.sparkContext.defaultParallelism
    multis = (
        sess.filter(F.col("_n") > 2)
        .drop("_n")
        .repartition(n_part, F.col("session_id"))
        .sortWithinPartitions("session_id", "start", "hash")
        .mapInPandas(_resolve_sessions_stream(compare), L1_SCHEMA)
    )

    return singles.drop("_n").unionByName(pair_path).unionByName(multis)


def l1_flatten(l1: DataFrame, min_n: int = 2) -> DataFrame:
    """K1-sink projection: one row per constituent of each coincidence
    (reference include/sink/mqtt.h:146-184), uuid from (hash, start)."""
    groups = l1.filter(F.col("n") >= min_n).select(
        F.concat(
            F.lpad(F.hex(F.col("events")[0]["hash"]), 16, "0"),
            F.lpad(F.hex(F.col("start")), 16, "0"),
        ).alias("uuid"),
        "session_id",
        F.col("start").alias("group_start"),
        F.col("end").alias("group_end"),
        "n",
        "conflicting",
        "true_e",
        F.posexplode("events").alias("pos", "evt"),
    )
    return groups.select(
        "uuid",
        "session_id",
        "group_start",
        "group_end",
        "n",
        "conflicting",
        "true_e",
        "pos",
        F.col("evt.hash").alias("hash"),
        F.col("evt.start").alias("start"),
        F.col("evt.end").alias("end"),
        F.col("evt.time_acc").alias("time_acc"),
    )
