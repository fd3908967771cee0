"""Distributed exact ranking: ``ntile`` semantics without a per-group
single-task sort window.

``ntile(B) OVER (PARTITION BY g ORDER BY k)`` is the one remaining
global-sort shape in the engine's exact paths (ccnet_ppl_buckets): Spark
executes it as ONE task per group value, which serializes a 100 TB
language partition through a single sort. The distributed equivalent is
the same boundary-statistics trick the sessionizer uses
(operators/sessionize.py):

1. range-partition by the TOTAL sort key ``(g, k...)`` — Spark's range
   exchange gives globally ordered, non-overlapping partitions;
2. one cheap counting pass: rows per ``(physical partition, g)`` — an
   O(P x G) table the driver prefix-sums into per-partition starting
   offsets (kilobytes at thousands of partitions);
3. one Arrow pass with partition-local running counters: global rank =
   partition offset + local rank, and the bucket falls out of the
   closed-form ntile formula (first ``n mod B`` buckets get one extra
   row) — bit-identical to the window ``ntile`` for any total order.

The sort key must be TOTAL (include a unique tiebreaker such as doc_id);
with ties across a partition boundary the per-engine orders could
otherwise diverge. Both passes are distributed; nothing anywhere sorts a
whole group on one task. Ref parity: CCNet's per-language perplexity
tertiles (Wenzek et al. 2020) at hypertable scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField


def exact_ntile(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    n_buckets: int,
    bucket_col: str = "bucket",
    bucket_names: list[str] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Append ``bucket_col`` holding the exact ``ntile(n_buckets)`` bucket
    of each row within its ``group_col`` group under ``order_cols``
    (which, with ``group_col`` prepended, must be a total order).

    ``bucket_names[i]`` labels bucket i+1 (default: the bucket number as
    a string). Output rows and all input columns are preserved.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if bucket_names is None:
        bucket_names = [str(i + 1) for i in range(n_buckets)]
    assert len(bucket_names) == n_buckets

    key = [group_col, *order_cols]
    # one range exchange gives global order; sortWithinPartitions makes
    # each physical partition locally sorted so ranks are cumulative counts.
    # persist (lazy): the counting pass below is the FIRST action, so one
    # job both materializes the cache and produces the boundary statistics
    # — an eager checkpoint here would split that into two jobs. The
    # recompute hazard (evicted cache re-executed with reservoir-resampled
    # range boundaries, silently shifting rows across pids) is covered by
    # the fail-loud per-(pid, group) count validation in assign() below.
    data = df.repartitionByRange(n_partitions, *key).sortWithinPartitions(*key)
    data = data.persist()

    # pass 1: O(P x G) boundary statistics -> per-(partition, group)
    # starting offsets and per-group totals, prefix-summed on the driver
    # (this action also populates the persisted cache)
    counts = (
        data.select(F.spark_partition_id().alias("_pid"), F.col(group_col))
        .groupBy("_pid", group_col)
        .count()
        .collect()
    )
    totals: dict = {}
    for row in counts:
        totals[row[group_col]] = totals.get(row[group_col], 0) + row["count"]
    offsets: dict = {}
    running: dict = {}
    for row in sorted(counts, key=lambda r: r["_pid"]):
        g = row[group_col]
        offsets[(row["_pid"], g)] = running.get(g, 0)
        running[g] = running.get(g, 0) + row["count"]
    pid_counts = {(row["_pid"], row[group_col]): row["count"] for row in counts}

    sc = spark.sparkContext
    offsets_b = sc.broadcast(offsets)
    totals_b = sc.broadcast(totals)
    pid_counts_b = sc.broadcast(pid_counts)

    # fresh StructType — StructType.add MUTATES, and DataFrame.schema is a
    # cached object, so adding to it in place corrupts the input's schema
    from pyspark.sql.types import StructType

    out_schema = StructType(
        list(data.schema.fields) + [StructField(bucket_col, StringType(), False)]
    )
    names = list(bucket_names)
    nb = n_buckets

    def assign(iterator):
        import numpy as np
        import pandas as _pd
        from pyspark import TaskContext

        def norm(g):
            # pass 1's Spark rows carry None for a null group; pandas may
            # surface the same group as NaN/NaT — normalize for dict lookups
            return None if g is None or _pd.isna(g) else g

        pid = TaskContext.get().partitionId()
        seen: dict = {}
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            # rows arrive sorted by (group, order), so groups are CONTIGUOUS
            # runs — everything per-row derives from one per-GROUP lookup +
            # np.repeat, keeping Python dict access at O(unique groups).
            # dropna=False: pass 1 counts null groups, so dropping them here
            # would misalign np.repeat lengths against len(pdf)
            sizes = pdf.groupby(group_col, sort=False, dropna=False).size()
            gnames = [norm(g) for g in sizes.index]
            counts = sizes.to_numpy()
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            local = np.arange(len(pdf), dtype="int64") - np.repeat(starts, counts)
            group_base = np.array(
                [offsets_b.value[(pid, g)] + seen.get(g, 0) for g in gnames],
                dtype="int64",
            )
            rank = np.repeat(group_base, counts) + local + 1  # 1-based global rank
            n = np.repeat(
                np.array([totals_b.value[g] for g in gnames], dtype="int64"), counts
            )
            # closed-form ntile: q = n div B, rem = n mod B; the first rem
            # buckets hold q+1 rows
            q, rem = n // nb, n % nb
            fat = rem * (q + 1)  # rows covered by the q+1-sized buckets
            in_fat = rank <= fat
            b = np.where(
                in_fat,
                (rank - 1) // np.maximum(q + 1, 1),
                rem + (rank - fat - 1) // np.maximum(q, 1),
            ).astype("int64")  # 0-based bucket
            out = pdf.copy()
            out[bucket_col] = np.array(names, dtype=object)[b]
            # advance the carry for the groups seen in this batch
            for g, c in zip(gnames, counts):
                seen[g] = seen.get(g, 0) + int(c)
            yield out
        # fail LOUDLY if this pid's rows disagree with the pass-1 counts —
        # any drift (block recomputation, boundary resample) would
        # otherwise mis-bucket silently
        expect = {g: int(c) for (p, g), c in pid_counts_b.value.items() if p == pid}
        if seen != expect:
            raise RuntimeError(
                f"exact_ntile: partition {pid} rows diverged from the pass-1 "
                f"counts (saw {seen}, expected {expect}) — the range exchange "
                f"was recomputed with different boundaries"
            )

    result = data.mapInPandas(assign, out_schema)
    # note: the persist is released by the caller's session-level cache
    # cleanup (bench, the oracle-parity tests, and the verify CLI all call
    # session.release_cached periodically); eager unpersist here would
    # recompute `data` for every downstream action — and any such
    # recompute is caught loudly by assign()'s count validation
    return result
