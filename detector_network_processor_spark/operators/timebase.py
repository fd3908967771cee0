"""Adaptive timebase / slowdown factor (SURVEY.md §2.7 W1-W3) as batch
calibration plans.

The reference's feedback loop (event-time span sampled every 2 s ->
timebase; per-station rate dip -> factor; product clamped to [2 s, 30 min]
group timeout) has no Spark-native streaming form (SURVEY.md §4.2 item 2);
the engine runs it as a calibration query over history — the values it
produces configure the streaming job's session gap/watermark. Batch
canonical: the 2 s processing-time sampling becomes tumbling 2 s event-time
buckets.

- W1 (src/supervision/timebase.cpp:17-45): per 2 s bucket, observed span =
  max(start)-min(start), clamped to [800 ms, 2 min].
- W2 (src/analysis/detectorstation.cpp:127-135): per station per rate
  interval, factor = ((mean - cur)/sigma + 1)*2 when cur < mean - sigma
  else 1; cluster factor = max over reliable stations — here over all
  stations with enough history (reliability labeling composes upstream).
- W3 (src/messages/event.cpp:7-11): timeout = clamp(base*factor, 2 s, 30 min).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

NS = 1_000_000_000
TIMEBASE_SAMPLE_NS = 2 * NS
TIMEBASE_MIN_NS = 800_000_000  # 800 ms
TIMEBASE_MAX_NS = 120 * NS  # 2 min
TIMEOUT_MIN_NS = 2 * NS
TIMEOUT_MAX_NS = 30 * 60 * NS


def timebase_calibration(events: DataFrame, ts_col: str = "start") -> DataFrame:
    """W1: per 2 s sample bucket, the clamped observed event-time span."""
    b = events.withColumn("bucket", F.expr(f"{ts_col} div {TIMEBASE_SAMPLE_NS}"))
    return (
        b.groupBy("bucket")
        .agg((F.max(ts_col) - F.min(ts_col)).alias("span_ns"), F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "timebase_ns",
            F.greatest(F.lit(TIMEBASE_MIN_NS), F.least(F.lit(TIMEBASE_MAX_NS), F.col("span_ns"))),
        )
    )


def rate_factor(events: DataFrame, ts_col: str = "start", hash_col: str = "hash",
                interval_ns: int = 30 * NS, history: int = 10) -> DataFrame:
    """W2: per station per interval, the slowdown factor from the rate dip
    test cur < mean - sigma over the trailing ``history`` intervals."""
    b = events.withColumn("ivl", F.expr(f"{ts_col} div {interval_ns}"))
    counts = b.groupBy(hash_col, "ivl").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(hash_col).orderBy("ivl").rowsBetween(-history + 1, 0)
    mean = F.avg("c").over(w)
    # population stddev over the trailing window (matches the rate ring)
    sigma = F.sqrt(F.avg(F.col("c") * F.col("c")).over(w) - mean * mean)
    cur = F.col("c").cast("double")
    factor = F.when(
        (sigma > 0) & (cur < (mean - sigma)), ((mean - cur) / sigma + 1.0) * 2.0
    ).otherwise(F.lit(1.0))
    return counts.select(
        hash_col,
        "ivl",
        F.col("c").alias("n_events"),
        F.round(mean, 6).alias("mean_rate"),
        F.round(sigma, 6).alias("sigma_rate"),
        F.round(factor, 6).alias("factor"),
    )


def group_timeout(timebase_ns, factor) -> F.Column:
    """W3: clamp(timebase * factor, 2 s, 30 min) — grow-only per group is a
    property of the streaming state op, not of this pure function."""
    return F.greatest(
        F.lit(TIMEOUT_MIN_NS), F.least(F.lit(TIMEOUT_MAX_NS), (timebase_ns * factor).cast("long"))
    )
