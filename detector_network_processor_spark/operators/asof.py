"""As-of (point-in-time) join — a time-series operator the reference lacks
(SURVEY.md §2.4 notes "no as-of joins" in the inventory) but that any user
of a detector-event store needs: "for each event, the latest calibration /
telemetry / order row at or before its timestamp, per key".

Spark has no built-in as-of join, so this implements it as a composition of
existing DataFrame ops (no UDF):

    union(tagged left, tagged right)
      → single hash shuffle on the key
      → in-partition sort by (time, side, tiebreak)
      → ``last(right_cols, ignorenulls=True)`` running window
      → filter back to left rows

Scale posture (100 TB): this is the sort-merge as-of strategy — exactly ONE
shuffle on the join key for both inputs combined, no range explosion, no
per-row probe. Skew is bounded by key cardinality like any sort-merge join;
a hot key can be pre-salted upstream. Compare with the naive
``left JOIN right ON key AND r.ts <= l.ts`` + argmax, which materializes
O(|matches|) intermediate rows (quadratic in per-key density) before
reducing — that plan dies at scale, this one never inflates.

Determinism: ties are resolved explicitly — a right row at exactly the left
row's timestamp matches (inclusive as-of, the common convention), and among
right rows sharing a timestamp the one with the greatest ``right_tiebreak``
wins. The result is therefore a pure function of the inputs, independent of
partitioning or arrival order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: attach, to every ``left`` row, the columns
    ``right_cols`` of the latest ``right`` row with the same ``on`` key and
    ``right_time <= left_time`` (NULLs when no such row exists).

    Returned columns: all of ``left``'s, plus ``{prefix}{c}`` for each
    ``c`` in ``right_cols``.
    """
    from pyspark.sql.types import StructType

    tiebreak = right_tiebreak or right_cols[0]
    # The right payload travels as ONE struct so the running last() picks the
    # latest matching right row atomically — per-column last(ignorenulls)
    # would let each column independently fall back past a NULL in the
    # latest row, stitching a composite row that never existed.
    rrow_type = StructType([right.schema[c] for c in right_cols])

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        # Left rows sort AFTER right rows at the same timestamp → inclusive.
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tie"),
        F.lit(None).cast(l_tagged.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "_lrow",
        "_side",
        F.last("_rrow", ignorenulls=True).over(w).alias("_asof"),
    )
    out = filled.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str,
    start: str,
    end: str,
    point_time: str,
    bucket_width: int,
) -> DataFrame:
    """Interval-overlap join: pair every ``points`` row with every
    ``intervals`` row of the same ``on`` key whose ``[start, end]`` (closed)
    contains ``point_time``. All three time columns are int64 in the same
    unit; ``bucket_width`` must be >= the maximum interval length.

    Plan shape (100 TB posture): the interval side explodes to the
    ``sequence()`` of fixed-width buckets it covers (<= 2 per interval when
    ``bucket_width`` >= max length), the point side computes one bucket id,
    and the pairing is a hash equi-join on ``(key, bucket)`` with the exact
    BETWEEN as a cheap residual filter. Catalyst would otherwise plan the
    raw theta-join ``key = key AND ts BETWEEN s AND e`` as a
    BroadcastNestedLoopJoin / cartesian per key — O(n·m) probes. The
    bucketed form shuffle-partitions both sides and scales linearly, the
    same strategy as the coincidence band join (plans/relational.py
    ``coincidence_pairs``), generalized to asymmetric intervals.
    """
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.expr(f"{start} div {bucket_width}"), F.expr(f"{end} div {bucket_width}"))),
    )
    pt = points.withColumn("_bucket", F.expr(f"{point_time} div {bucket_width}"))
    joined = pt.join(iv, on=[on, "_bucket"]).filter(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.drop("_bucket")
