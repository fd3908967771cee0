"""Scalable global gap-based sessionization.

Groups rows into "sessions" where consecutive timestamps (global order) are
within ``gap``; a break opens a new session. This is the candidate-generation
phase of the coincidence operator (SURVEY.md §2.5): the criterion's hard time
cutoff guarantees any coincidence edge lies within one gap-session.

100 TB design: a naive global window (``Window.orderBy(ts)`` with no
partition key) funnels everything through ONE task. Instead:

1. ``repartitionByRange(ts)`` + ``sortWithinPartitions`` — distributed range
   sort; each partition holds a contiguous time slice. This is the ONLY
   full-data shuffle the operator performs.
2. ``mapInPandas`` assigns *local* session ids AND local session sizes per
   partition (the partition is buffered — the same memory bound the sort
   itself already implies for a task).
3. Per-partition boundary stats are O(#partitions) on the driver — a
   union-find over adjacent boundaries merges sessions spanning partition
   edges (chains across whole partitions included), and corrects the sizes
   of exactly those boundary sessions.
4. Global ids/sizes are applied as JVM map-lookup expressions — no second
   shuffle, no join.

The emitted ``session_n`` lets callers route singleton sessions (the vast
majority at production rates) down a narrow no-shuffle path.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

SESSION_COL = "session_id"
SESSION_N_COL = "session_n"


def _lit_map(d: dict):
    return F.create_map(*chain.from_iterable((F.lit(k), F.lit(v)) for k, v in d.items()))


def sessionize_global_gap(
    df: DataFrame, ts_col: str, gap: int, num_partitions: int | None = None
) -> DataFrame:
    """Add globally-consistent ``session_id`` and ``session_n`` columns.

    Two rows share a session iff they are connected by a chain of
    consecutive-timestamp steps each <= ``gap`` (in ``ts_col`` units).
    The returned DataFrame is persisted (callers typically branch on it);
    rows within a partition remain sorted by ``ts_col``.
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
        ranged.schema.fields
        + [
            StructField("_local_sid", LongType(), False),
            StructField("_local_n", LongType(), False),
            StructField("_is_last", LongType(), False),
        ]
    )
    ts_name = ts_col

    def assign_local(iterator):
        parts = [pdf for pdf in iterator if len(pdf)]
        if not parts:
            return
        pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        ts = pdf[ts_name].to_numpy(dtype=np.int64)
        brk = np.zeros(len(ts), dtype=np.int64)
        brk[1:] = (np.diff(ts) > gap).astype(np.int64)
        sids = np.cumsum(brk)
        counts = np.bincount(sids)
        pdf = pdf.copy()
        pdf["_local_sid"] = sids
        pdf["_local_n"] = counts[sids]
        pdf["_is_last"] = (sids == sids[-1]).astype(np.int64)
        yield pdf

    local = ranged.mapInPandas(assign_local, out_schema).persist()

    stats = (
        local.groupBy("_pid")
        .agg(
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
            F.max("_local_sid").alias("max_sid"),
            F.sum(F.when(F.col("_local_sid") == 0, 1).otherwise(0)).alias("first_n"),
            F.sum("_is_last").alias("last_n"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("_pid")
        .collect()  # O(#partitions) rows — driver-safe at any data scale
    )

    # Per-partition offsets into the global id space.
    offsets: dict[int, int] = {}
    acc = 0
    for r in stats:
        offsets[r["_pid"]] = acc
        acc += r["max_sid"] + 1

    if not offsets:  # empty input
        return (
            local.withColumn(SESSION_COL, F.col("_local_sid"))
            .withColumn(SESSION_N_COL, F.col("_local_n"))
            .drop("_pid", "_local_sid", "_local_n", "_is_last")
        )

    last_n = {r["_pid"]: r["last_n"] for r in stats}

    # Union-find over boundary sessions of adjacent (non-empty) partitions.
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members: set[int] = set()
    for prev, cur in zip(stats, stats[1:]):
        if cur["min_ts"] - prev["max_ts"] <= gap:
            a = offsets[prev["_pid"]] + prev["max_sid"]
            b = offsets[cur["_pid"]] + 0
            union(a, b)
            members.add(a)
            members.add(b)

    # Sizes of merged components: every member is a first/last session of
    # some partition, whose local size we know.
    size_fix: dict[int, int] = {}
    if members:
        bsize: dict[int, int] = {}
        for r in stats:
            pid = r["_pid"]
            if r["max_sid"] == 0:
                bsize[offsets[pid]] = int(r["n_rows"])  # whole partition = one session
            else:
                bsize[offsets[pid]] = int(r["first_n"])
                bsize[offsets[pid] + r["max_sid"]] = int(last_n[pid])
        comp_sizes: dict[int, int] = {}
        for gid in members:
            root = find(gid)
            comp_sizes[root] = comp_sizes.get(root, 0) + bsize[gid]
        size_fix = {gid: comp_sizes[find(gid)] for gid in members}

    remap = {k: find(k) for k in parent if find(k) != k}

    global_sid = F.col("_local_sid") + F.element_at(_lit_map(offsets), F.col("_pid"))
    session = F.coalesce(F.element_at(_lit_map(remap), global_sid), global_sid) if remap else global_sid
    session_n = (
        F.coalesce(F.element_at(_lit_map(size_fix), global_sid), F.col("_local_n"))
        if size_fix
        else F.col("_local_n")
    )

    return (
        local.withColumn(SESSION_COL, session.cast("long"))
        .withColumn(SESSION_N_COL, session_n.cast("long"))
        .drop("_pid", "_local_sid", "_local_n", "_is_last")
    )
