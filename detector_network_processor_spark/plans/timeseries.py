"""Time-series operator surface: as-of join, interval-overlap join,
hypertable-style multi-resolution rollup, grouped top-k.

The reference manages time-series streams but has none of these operators
(SURVEY.md §2.4: "no sort-merge, no outer/semi/anti, no as-of"; §2.10 lists
the absent relational surface). They are table stakes for a detector-event
store at 100 TB — "latest telemetry at or before each event" is an as-of
join, continuous aggregates are bucket rollups — so the engine provides
them as first-class, oracle-checked operators built purely from DataFrame
compositions (no UDFs, fully inside whole-stage codegen).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from ..operators.asof import asof_join, interval_join
from . import register
from .relational import _EVENTS_US_SQL, _events_us


@register(
    "asof_join_events",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
tagged AS (
  SELECT user_id AS k, ts_us AS t, 1 AS side, event_id,
         NULL::BIGINT AS r_id, NULL::BIGINT AS r_ts
  FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts_us, 0, NULL, event_id, ts_us
  FROM ev WHERE event_type = 'click'
),
filled AS (
  SELECT side, event_id, k AS user_id, t AS ts_us,
         last_value(r_id IGNORE NULLS) OVER w AS click_event_id,
         last_value(r_ts IGNORE NULLS) OVER w AS click_ts_us
  FROM tagged
  WINDOW w AS (PARTITION BY k ORDER BY t, side, r_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_us, click_event_id, click_ts_us,
       ts_us - click_ts_us AS gap_us
FROM filled WHERE side = 1
ORDER BY event_id
""",
    doc=(
        "As-of (point-in-time) join: each purchase gets the latest same-user "
        "click at or before it. Single-shuffle union+window strategy "
        "(operators/asof.py) — the oracle mirrors the same deterministic "
        "tie-break spec, not the implementation."
    ),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts_us")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us", "event_id")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts_us",
        right_time="ts_us",
        right_cols=["event_id", "ts_us"],
        right_tiebreak="event_id",
        prefix="click_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("click_event_id"),
        F.col("click_ts_us"),
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    ).orderBy("event_id")


@register(
    "interval_join_events",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
e AS (SELECT event_id AS error_id, user_id, ts_us AS w_start,
             ts_us + 300000000 AS w_end
      FROM ev WHERE event_type = 'error'),
c AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts_us
      FROM ev WHERE event_type = 'click')
SELECT error_id, click_id, e.user_id AS user_id, w_start, click_ts_us,
       click_ts_us - w_start AS latency_us
FROM e JOIN c ON e.user_id = c.user_id
             AND click_ts_us BETWEEN w_start AND w_end
ORDER BY error_id, click_id
""",
    doc=(
        "Interval-overlap join: clicks landing inside the 5-minute window "
        "after each same-user error. Bucketed equi-join plan "
        "(operators/asof.py::interval_join) — the raw theta-join the oracle "
        "states would be a per-key nested loop at scale."
    ),
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    window_us = 300_000_000  # 5 min
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_us").alias("w_start"),
        (F.col("ts_us") + window_us).alias("w_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
    )
    joined = interval_join(
        errors,
        clicks,
        on="user_id",
        start="w_start",
        end="w_end",
        point_time="click_ts_us",
        bucket_width=window_us,
    )
    return joined.select(
        "error_id",
        "click_id",
        "user_id",
        "w_start",
        "click_ts_us",
        (F.col("click_ts_us") - F.col("w_start")).alias("latency_us"),
    ).orderBy("error_id", "click_id")


@register(
    "time_bucket_rollup",
    oracle="""
WITH ev AS (SELECT epoch_us(ts) AS ts_us, value FROM events),
m AS (SELECT ts_us // 60000000 AS mb, count(*) AS n, sum(value) AS s
      FROM ev GROUP BY 1),
h AS (SELECT mb // 60 AS hb, CAST(sum(n) AS BIGINT) AS n, sum(s) AS s FROM m GROUP BY 1),
d AS (SELECT hb // 24 AS db, CAST(sum(n) AS BIGINT) AS n, sum(s) AS s FROM h GROUP BY 1)
SELECT 'minute' AS resolution, mb * 60000000 AS bucket_us,
       n AS n_events, round(s, 4) AS sum_value
FROM m
UNION ALL
SELECT 'hour', hb * 3600000000, n, round(s, 4) FROM h
UNION ALL
SELECT 'day', db * 86400000000, n, round(s, 4) FROM d
ORDER BY resolution, bucket_us
""",
    doc=(
        "Hypertable-style continuous aggregate: minute buckets computed from "
        "the raw scan ONCE, hour and day derived by re-aggregating the "
        "minute partials (the TimescaleDB rollup cascade). At 100 TB the "
        "coarser grains cost O(minutes), not O(events) — no second scan."
    ),
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    minute_us, hour_us, day_us = 60_000_000, 3_600_000_000, 86_400_000_000
    ev = _events_us(spark, sf_dir)
    minute = (
        ev.groupBy(F.expr(f"ts_us div {minute_us}").alias("mb"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    hour = minute.groupBy(F.expr("mb div 60").alias("hb")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    day = hour.groupBy(F.expr("hb div 24").alias("db")).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )

    def out(df: DataFrame, tag: str, bucket_col: str, width: int) -> DataFrame:
        return df.select(
            F.lit(tag).alias("resolution"),
            (F.col(bucket_col) * width).alias("bucket_us"),
            F.col("n").alias("n_events"),
            F.round("s", 4).alias("sum_value"),
        )

    return (
        out(minute, "minute", "mb", minute_us)
        .unionByName(out(hour, "hour", "hb", hour_us))
        .unionByName(out(day, "day", "db", day_us))
        .orderBy("resolution", "bucket_us")
    )


@register(
    "topk_per_group",
    oracle="""
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk
""",
    doc=(
        "Grouped top-k via rank window + filter. Spark >= 3.5 rewrites this "
        "to WindowGroupLimit: each map task keeps a per-group k-heap, so the "
        "shuffle carries O(groups * k) rows, not the full table — the plan "
        "survives 100 TB without a global sort."
    ),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_orderpriority",
            F.row_number().over(w).alias("rnk"),
            "o_orderkey",
            "o_totalprice",
        )
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rnk")
    )
