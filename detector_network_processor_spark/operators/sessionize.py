"""Scalable global gap-based sessionization.

Groups rows into "sessions" where consecutive timestamps (global order) are
within ``gap``; a break opens a new session. This is the candidate-generation
phase of the coincidence operator (SURVEY.md §2.5): the criterion's hard time
cutoff guarantees any coincidence edge lies within one gap-session.

100 TB design: a naive global window (``Window.orderBy(ts)`` with no
partition key) funnels everything through ONE task. Instead:

1. ``repartitionByRange(ts)`` + ``sortWithinPartitions`` — distributed range
   sort, each partition holds a contiguous time slice.
2. ``mapInPandas`` assigns *local* session ids per partition (state carried
   across Arrow batches — zero shuffle beyond the range exchange).
3. Per-partition boundary stats (first/last timestamp + session count) are
   O(#partitions) — kilobytes on the driver even at 100k partitions. A
   union-find over adjacent boundaries merges sessions that span partition
   edges (chains across whole partitions included).
4. Local ids + per-partition offsets + the (tiny) boundary remap are applied
   as JVM map-lookup expressions — no second shuffle of the data.
"""

from __future__ import annotations

from itertools import chain

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

SESSION_COL = "session_id"


def sessionize_global_gap(
    df: DataFrame, ts_col: str, gap: int, num_partitions: int | None = None
) -> DataFrame:
    """Add a globally-consistent ``session_id`` (long) column to ``df``.

    Two rows share a session iff they are connected by a chain of
    consecutive-timestamp steps each <= ``gap`` (in ``ts_col`` units).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = (
        df.repartitionByRange(num_partitions, F.col(ts_col))
        .sortWithinPartitions(ts_col)
        .withColumn("_pid", F.spark_partition_id())
    )

    out_schema = StructType(
        ranged.schema.fields + [StructField("_local_sid", LongType(), False)]
    )
    ts_idx = ranged.schema.fieldNames().index(ts_col)

    def assign_local(iterator):
        sid = 0
        last_ts = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            ts = pdf.iloc[:, ts_idx].to_numpy()
            sids = []
            for t in ts:
                if last_ts is not None and (t - last_ts) > gap:
                    sid += 1
                last_ts = t
                sids.append(sid)
            pdf = pdf.copy()
            pdf["_local_sid"] = pd.array(sids, dtype="int64")
            yield pdf

    # Persisted: the boundary-stats job below and the caller's downstream job
    # would otherwise both re-run the range sort.
    local = ranged.mapInPandas(assign_local, out_schema).persist()
    stats = (
        local.groupBy("_pid")
        .agg(
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
            F.max("_local_sid").alias("max_sid"),
        )
        .orderBy("_pid")
        .collect()  # O(#partitions) rows — driver-safe at any data scale
    )

    # Per-partition offset into the global id space.
    offsets: dict[int, int] = {}
    acc = 0
    for r in stats:
        offsets[r["_pid"]] = acc
        acc += r["max_sid"] + 1

    # Union-find over boundary sessions of adjacent (non-empty) partitions.
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for prev, cur in zip(stats, stats[1:]):
        if cur["min_ts"] - prev["max_ts"] <= gap:
            a = find(offsets[prev["_pid"]] + prev["max_sid"])  # last session of prev
            b = find(offsets[cur["_pid"]] + 0)  # first session of cur
            if a != b:
                parent[max(a, b)] = min(a, b)

    remap = {k: find(k) for k in parent}

    global_sid = F.col("_local_sid") + F.element_at(
        F.create_map(*chain.from_iterable((F.lit(p), F.lit(o)) for p, o in offsets.items())),
        F.col("_pid"),
    ) if offsets else F.col("_local_sid")

    if remap:
        remap_expr = F.element_at(
            F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in remap.items())),
            global_sid,
        )
        session = F.coalesce(remap_expr, global_sid)
    else:
        session = global_sid

    return local.withColumn(SESSION_COL, session.cast("long")).drop("_pid", "_local_sid")
