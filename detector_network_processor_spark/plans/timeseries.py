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
m AS (SELECT ts_us // 60000000 AS mb, count(*) AS n,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS s6
      FROM ev GROUP BY 1),
h AS (SELECT mb // 60 AS hb, CAST(sum(n) AS BIGINT) AS n, CAST(sum(s6) AS BIGINT) AS s6 FROM m GROUP BY 1),
d AS (SELECT hb // 24 AS db, CAST(sum(n) AS BIGINT) AS n, CAST(sum(s6) AS BIGINT) AS s6 FROM h GROUP BY 1)
SELECT 'minute' AS resolution, mb * 60000000 AS bucket_us,
       n AS n_events, round(s6 / 1000000.0, 4) AS sum_value
FROM m
UNION ALL
SELECT 'hour', hb * 3600000000, n, round(s6 / 1000000.0, 4) FROM h
UNION ALL
SELECT 'day', db * 86400000000, n, round(s6 / 1000000.0, 4) FROM d
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
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("s6"),
        )
    )
    hour = minute.groupBy(F.expr("mb div 60").alias("hb")).agg(
        F.sum("n").alias("n"), F.sum("s6").alias("s6")
    )
    day = hour.groupBy(F.expr("hb div 24").alias("db")).agg(
        F.sum("n").alias("n"), F.sum("s6").alias("s6")
    )

    def out(df: DataFrame, tag: str, bucket_col: str, width: int) -> DataFrame:
        return df.select(
            F.lit(tag).alias("resolution"),
            (F.col(bucket_col) * width).alias("bucket_us"),
            F.col("n").alias("n_events"),
            F.round(F.col("s6") / 1_000_000.0, 4).alias("sum_value"),
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


_GF_HOUR_US = 3_600_000_000


@register(
    "gap_fill_locf",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
obs AS (
  SELECT user_id, ts_us // {_GF_HOUR_US} AS hb,
         CAST(round(avg(value) * 1000000) AS BIGINT) AS v6, count(*) AS n
  FROM ev GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(hb) AS mn, max(hb) AS mx FROM obs GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(mn, mx)) AS hb FROM bounds
),
filled AS (
  SELECT s.user_id, s.hb, o.v6, o.n,
         last_value(o.v6 IGNORE NULLS) OVER w_past AS locf6,
         last_value(CASE WHEN o.v6 IS NOT NULL THEN s.hb END IGNORE NULLS) OVER w_past AS prev_b,
         first_value(o.v6 IGNORE NULLS) OVER w_next AS next_v6,
         first_value(CASE WHEN o.v6 IS NOT NULL THEN s.hb END IGNORE NULLS) OVER w_next AS next_b
  FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.hb = o.hb
  WINDOW w_past AS (PARTITION BY s.user_id ORDER BY s.hb
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY s.user_id ORDER BY s.hb
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hb * {_GF_HOUR_US} AS bucket_us,
       CAST(coalesce(n, 0) AS BIGINT) AS n_events,
       CAST(v6 IS NULL AS INTEGER) AS is_gap,
       locf6 / 1000000.0 AS value_locf,
       CASE WHEN v6 IS NOT NULL THEN v6
            ELSE locf6 + CAST(floor((next_v6 - locf6) * (hb - prev_b) * 1.0
                                    / (next_b - prev_b)) AS BIGINT)
       END / 1000000.0 AS value_interp
FROM filled
ORDER BY user_id, bucket_us
""",
    doc=(
        "Hypertable gap-fill: per-key hourly spine between each key's first "
        "and last observation (explode over a sequence — no cross join with "
        "a global calendar), left join of observed buckets, then "
        "last-observation-carried-forward and linear interpolation via "
        "IGNORE NULLS window frames. Everything is JVM window/join work; "
        "spine size is bounded per key, so the plan is a hash shuffle on the "
        "key plus one sort within partitions — TimescaleDB's time_bucket_gapfill"
        "/locf/interpolate re-expressed in Spark built-ins."
    ),
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Observed values are integer-scaled to micro-units and the linear
    # interpolation runs as exact-integer arithmetic with one floored
    # double division — cross-engine round() of halfway doubles disagrees
    # (Spark decimal-string HALF_UP vs DuckDB scaled-double), while
    # floor((int*int)/int) is IEEE-deterministic on both.
    ev = _events_us(spark, sf_dir)
    obs = ev.groupBy(
        "user_id", F.expr(f"ts_us div {_GF_HOUR_US}").alias("hb")
    ).agg(
        F.round(F.avg("value") * 1_000_000).cast("long").alias("v6"),
        F.count(F.lit(1)).alias("n"),
    )
    spine = (
        obs.groupBy("user_id")
        .agg(F.min("hb").alias("mn"), F.max("hb").alias("mx"))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("hb"))
    )
    filled = spine.join(obs, ["user_id", "hb"], "left")
    w_past = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_b = F.when(F.col("v6").isNotNull(), F.col("hb"))
    staged = filled.select(
        "user_id",
        "hb",
        "v6",
        "n",
        F.last("v6", ignorenulls=True).over(w_past).alias("locf6"),
        F.last(obs_b, ignorenulls=True).over(w_past).alias("prev_b"),
        F.first("v6", ignorenulls=True).over(w_next).alias("next_v6"),
        F.first(obs_b, ignorenulls=True).over(w_next).alias("next_b"),
    )
    interp6 = F.when(F.col("v6").isNotNull(), F.col("v6")).otherwise(
        F.col("locf6")
        + F.floor(
            (F.col("next_v6") - F.col("locf6"))
            * (F.col("hb") - F.col("prev_b"))
            * 1.0
            / (F.col("next_b") - F.col("prev_b"))
        ).cast("long")
    )
    return staged.select(
        "user_id",
        (F.col("hb") * _GF_HOUR_US).alias("bucket_us"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.col("v6").isNull().cast("int").alias("is_gap"),
        (F.col("locf6") / 1_000_000.0).alias("value_locf"),
        (interp6 / 1_000_000.0).alias("value_interp"),
    ).orderBy("user_id", "bucket_us")


@register(
    "merge_upsert",
    oracle="""
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders
),
ch AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 7 THEN 'D'
              WHEN o_orderkey % 10 = 3 THEN 'U' END AS op,
         (pc * 11) // 10 AS new_pc
  FROM base WHERE o_orderkey % 10 IN (3, 7)
  UNION ALL
  SELECT o_orderkey + 100000000, 'I', pc // 2
  FROM base WHERE o_orderkey % 10 = 1
),
merged AS (
  SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
         CASE WHEN c.op IS NULL THEN 'keep'
              WHEN c.op = 'U' THEN 'update'
              WHEN c.op = 'I' THEN 'insert'
              ELSE 'delete' END AS action,
         CASE WHEN c.op IN ('U', 'I') THEN c.new_pc ELSE b.pc END AS pc
  FROM base b FULL OUTER JOIN ch c ON b.o_orderkey = c.o_orderkey
)
SELECT action, count(*) AS n_rows,
       round(CAST(sum(pc) AS BIGINT) / 100.0, 2) AS total_price
FROM merged
GROUP BY action
ORDER BY action
""",
    doc=(
        "CDC snapshot merge (MERGE INTO semantics without a table format): "
        "one FULL OUTER hash join of base vs changes on the key applies "
        "updates, inserts and deletes in a single shuffle — the scalable "
        "shape for periodic upsert compaction of a 100 TB table (per-row "
        "point updates are not a thing in immutable parquet; batched "
        "join-merge is). Changes are synthesized deterministically from the "
        "orders fixture (U: key%10=3 re-priced, D: key%10=7, I: key%10=1 "
        "cloned to a new key range); output is the per-action row/price "
        "audit the merge job would emit."
    ),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All price arithmetic runs in integer cents: cross-engine round() of
    # halfway doubles (x.xx5 from *1.1 or /2) disagrees between Spark
    # (decimal-string HALF_UP) and DuckDB (scaled-double), and distributed
    # float summation is order-dependent — integers are exact on both counts.
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("pc")
    )
    upd = base.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey", F.lit("U").alias("op"), F.expr("(pc * 11) div 10").alias("new_pc")
    )
    dele = base.filter(F.col("o_orderkey") % 10 == 7).select(
        "o_orderkey", F.lit("D").alias("op"), F.lit(None).cast("long").alias("new_pc")
    )
    # Insert keys are synthesized at a fixed +1e8 offset. This is safe only
    # while max(o_orderkey) < 1e8 — true for TPC-H SF < ~17, which covers
    # every fixture scale here (sf <= 0.1). At larger SF derive the offset
    # from max(o_orderkey) instead (and mirror it in the oracle SQL).
    ins = base.filter(F.col("o_orderkey") % 10 == 1).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.expr("pc div 2").alias("new_pc"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = base.join(changes, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.when(F.col("op").isNull(), "keep")
        .when(F.col("op") == "U", "update")
        .when(F.col("op") == "I", "insert")
        .otherwise("delete")
        .alias("action"),
        F.when(F.col("op").isin("U", "I"), F.col("new_pc")).otherwise(F.col("pc")).alias("pc"),
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("pc") / 100.0, 2).alias("total_price"),
        )
        .orderBy("action")
    )


_FUNNEL_WINDOW_US = 86_400_000_000  # 24 h


@register(
    "funnel_conversion",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
v AS (SELECT user_id, min(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts_us) AS t2, min(v.t1) AS t1
  FROM ev e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts_us > v.t1
  GROUP BY e.user_id
),
cq AS (SELECT * FROM c WHERE t2 - t1 <= {_FUNNEL_WINDOW_US}),
p AS (
  SELECT e.user_id, min(e.ts_us) AS t3, min(cq.t1) AS t1
  FROM ev e JOIN cq ON e.user_id = cq.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > cq.t2
  GROUP BY e.user_id
),
pq AS (SELECT * FROM p WHERE t3 - t1 <= {_FUNNEL_WINDOW_US}),
counts AS (
  SELECT 1 AS step, 'view' AS funnel_step, count(*) AS n_users FROM v
  UNION ALL
  SELECT 2, 'view>click', count(*) FROM cq
  UNION ALL
  SELECT 3, 'view>click>purchase', count(*) FROM pq
)
SELECT step, funnel_step, n_users,
       round(n_users * 1.0 / (SELECT n_users FROM counts WHERE step = 1), 6) AS conversion
FROM counts ORDER BY step
""",
    doc=(
        "Ordered-funnel conversion (ClickHouse windowFunnel analog, "
        "earliest-event semantics): per user, the first 'view', the first "
        "'click' strictly after it, the first 'purchase' strictly after "
        "that, with the whole chain inside a 24 h window of step 1. Pure "
        "relational cascade — three hash-shuffled min-aggregations on "
        "user_id, no per-user sequence UDF, so at 100 TB it is three "
        "map-side-combined aggs instead of a collect_list-per-user sort. "
        "The step-N frame joins only step-(N-1) survivors, so each stage "
        "shrinks."
    ),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"), F.min("t1").alias("t1"))
    )
    cq = c.filter(F.col("t2") - F.col("t1") <= _FUNNEL_WINDOW_US)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cq, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"), F.min("t1").alias("t1"))
    )
    pq = p.filter(F.col("t3") - F.col("t1") <= _FUNNEL_WINDOW_US)
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step"), F.lit("view").alias("funnel_step"), "n_users"
        )
        .unionByName(
            cq.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("step"), F.lit("view>click").alias("funnel_step"), "n_users"
            )
        )
        .unionByName(
            pq.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("step"),
                F.lit("view>click>purchase").alias("funnel_step"),
                "n_users",
            )
        )
    )
    base = counts.filter(F.col("step") == 1).select(F.col("n_users").alias("n1"))
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            "step",
            "funnel_step",
            "n_users",
            F.round(F.col("n_users") * 1.0 / F.col("n1"), 6).alias("conversion"),
        )
        .orderBy("step")
    )


def _zorder_oracle() -> str:
    from ..functions.zorder import zorder_key_sql

    zk = zorder_key_sql("(user_id & 65535)", "((epoch_us(ts) // 3600000000) & 65535)")
    return f"""
WITH z AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hb, {zk} AS zkey
  FROM events
)
SELECT zkey // 4096 AS z_bucket, count(*) AS n_events,
       min(user_id) AS min_user, max(user_id) AS max_user,
       min(hb) AS min_hb, max(hb) AS max_hb
FROM z GROUP BY 1 ORDER BY z_bucket
"""


@register(
    "zorder_layout",
    oracle=_zorder_oracle(),
    doc=(
        "Z-order (Morton) layout keys over (user_id, hour-bucket): the "
        "storage-clustering key that gives BOTH dimensions file-skipping "
        "locality when used with io.write_partitioned / sortWithinPartitions "
        "(the Delta OPTIMIZE ZORDER pattern). The encoder is 32 unrolled JVM "
        "bit terms (functions/zorder.py) inside whole-stage codegen; the "
        "query reports per-z-bucket row counts and min/max of each dimension "
        "— the bounded ranges ARE the data-skipping guarantee the layout "
        "buys. Oracle recomputes the identical interleave in ANSI SQL."
    ),
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.zorder import zorder_key

    ev = _events_us(spark, sf_dir)
    hb = F.expr("ts_us div 3600000000")
    z = ev.select(
        "user_id",
        hb.alias("hb"),
        zorder_key(
            F.col("user_id").bitwiseAND(F.lit(65535)), hb.bitwiseAND(F.lit(65535))
        ).alias("zkey"),
    )
    return (
        z.groupBy(F.expr("zkey div 4096").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("hb").alias("min_hb"),
            F.max("hb").alias("max_hb"),
        )
        .orderBy("z_bucket")
    )


_DAY_US = 86_400_000_000


@register(
    "retention_cohorts",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
su AS (
  SELECT user_id, min(ts_us // {_DAY_US}) AS cohort_day
  FROM ev WHERE event_type = 'signup' GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, ts_us // {_DAY_US} AS day FROM ev),
j AS (
  SELECT DISTINCT s.cohort_day, a.day - s.cohort_day AS day_offset, a.user_id
  FROM act a JOIN su s ON a.user_id = s.user_id
  WHERE a.day >= s.cohort_day
),
ret AS (SELECT cohort_day, day_offset, count(*) AS n_active FROM j GROUP BY 1, 2),
sz AS (SELECT cohort_day, count(*) AS cohort_size FROM su GROUP BY 1)
SELECT r.cohort_day, r.day_offset, r.n_active, s.cohort_size,
       round(r.n_active * 1.0 / s.cohort_size, 6) AS retention
FROM ret r JOIN sz s ON r.cohort_day = s.cohort_day
ORDER BY r.cohort_day, r.day_offset
""",
    doc=(
        "Cohort retention matrix: users are cohorted by first-'signup' day; "
        "each (cohort_day, day_offset) cell counts cohort members active "
        "that day. Classic product-analytics rollup; at 100 TB the heavy "
        "side collapses to DISTINCT (user, day) BEFORE the cohort join, so "
        "the join carries <= users x days rows, never raw events, and both "
        "aggregations are map-side combined."
    ),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    day = F.expr(f"ts_us div {_DAY_US}")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("cohort_day"))
    )
    act = ev.select("user_id", day.alias("day")).distinct()
    j = (
        act.join(su, "user_id")
        .filter(F.col("day") >= F.col("cohort_day"))
        .select("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"), "user_id")
        .distinct()
    )
    ret = j.groupBy("cohort_day", "day_offset").agg(F.count(F.lit(1)).alias("n_active"))
    sz = su.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        ret.join(F.broadcast(sz), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") * 1.0 / F.col("cohort_size"), 6).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "rate_anomalies",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
hc AS (
  SELECT user_id, ts_us // {_GF_HOUR_US} AS hb, count(*) AS c
  FROM ev GROUP BY 1, 2
),
w AS (
  SELECT user_id, hb, c,
         count(*)       OVER tw AS n,
         CAST(sum(c)    OVER tw AS BIGINT) AS s,
         CAST(sum(c*c)  OVER tw AS BIGINT) AS ss
  FROM hc
  WINDOW tw AS (PARTITION BY user_id ORDER BY hb
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT user_id, hb, c, n,
         s * 1.0 / n AS mean,
         (ss * 1.0 / n) - (s * 1.0 / n) * (s * 1.0 / n) AS var
  FROM w WHERE n >= 6
)
SELECT user_id, hb * {_GF_HOUR_US} AS bucket_us, c AS n_events,
       round(mean, 6) AS trailing_mean,
       round((c - mean) / sqrt(var), 6) AS zscore
FROM z
WHERE var > 0 AND abs((c - mean) / sqrt(var)) > 3.0
ORDER BY user_id, bucket_us
""",
    doc=(
        "Trailing-window rate anomaly detection (the monitoring-side analog "
        "of the reference's rate rings, include/analysis/ratesupervisor.h): "
        "per-key hourly counts, z-score of each hour against its trailing "
        "24 observed hours (frame excludes the current row), flag |z| > 3. "
        "All moments are exact-integer window sums (count/sum/sum-of-"
        "squares), so mean/var/z are single deterministic IEEE expressions — "
        "cross-engine exact with no distributed float summation. One hash "
        "shuffle on the key + one frame sort; scales as O(events) map work."
    ),
)
def rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    hc = ev.groupBy(
        "user_id", F.expr(f"ts_us div {_GF_HOUR_US}").alias("hb")
    ).agg(F.count(F.lit(1)).alias("c"))
    tw = (
        Window.partitionBy("user_id").orderBy("hb").rowsBetween(-24, -1)
    )
    w = hc.select(
        "user_id",
        "hb",
        "c",
        F.count(F.lit(1)).over(tw).alias("n"),
        F.sum("c").over(tw).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(tw).alias("ss"),
    ).filter(F.col("n") >= 6)
    mean = F.col("s") * 1.0 / F.col("n")
    var = (F.col("ss") * 1.0 / F.col("n")) - mean * mean
    z = (F.col("c") - mean) / F.sqrt(var)
    return (
        w.filter((var > 0) & (F.abs(z) > 3.0))
        .select(
            "user_id",
            (F.col("hb") * _GF_HOUR_US).alias("bucket_us"),
            F.col("c").alias("n_events"),
            F.round(mean, 6).alias("trailing_mean"),
            F.round(z, 6).alias("zscore"),
        )
        .orderBy("user_id", "bucket_us")
    )


@register(
    "longest_outages",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
gaps AS (
  SELECT user_id, ts_us,
         lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts
  FROM ev
),
ranked AS (
  SELECT user_id, prev_ts AS gap_start_us, ts_us AS gap_end_us,
         ts_us - prev_ts AS gap_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us - prev_ts DESC, prev_ts) AS rn
  FROM gaps WHERE prev_ts IS NOT NULL
)
SELECT user_id, gap_start_us, gap_end_us, gap_us
FROM ranked WHERE rn = 1
ORDER BY user_id
""",
    doc=(
        "Longest silence per station (the relational telemetry view of the "
        "reference's offline detection, detectorstation.cpp:109-125): one "
        "lag window for inter-event gaps, then WindowGroupLimit keeps each "
        "key's maximum — both windows share the same hash shuffle on the "
        "key, so the whole query is one exchange + one sort regardless of "
        "stream size."
    ),
)
def longest_outages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    w_lag = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "user_id",
        "ts_us",
        F.lag("ts_us").over(w_lag).alias("prev_ts"),
    ).filter(F.col("prev_ts").isNotNull())
    w_max = Window.partitionBy("user_id").orderBy(
        F.desc(F.col("ts_us") - F.col("prev_ts")), F.asc("prev_ts")
    )
    return (
        gaps.select(
            "user_id",
            F.col("prev_ts").alias("gap_start_us"),
            F.col("ts_us").alias("gap_end_us"),
            (F.col("ts_us") - F.col("prev_ts")).alias("gap_us"),
            F.row_number().over(w_max).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


_USR_GAP_US = 1_800_000_000  # 30 min


@register(
    "user_sessions",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
d AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN ts_us - lag(ts_us) OVER w > {_USR_GAP_US}
                   OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
s AS (
  SELECT user_id, ts_us, event_id,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM d
)
SELECT user_id, sid AS session_no, count(*) AS n_events,
       min(ts_us) AS session_start_us,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_no
""",
    doc="Per-key gap sessionization (the classic 30-minute web-session split — distinct from the coincidence operator's GLOBAL cross-station sessions): lag + running-sum session ids inside one per-user window, then one agg. Two window passes over the same partitioning = a single shuffle on user_id; at 100 TB this is the textbook sessionize that needs no custom operator at all.",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = F.when(
        (F.col("ts_us") - F.lag("ts_us").over(w) > _USR_GAP_US)
        | F.lag("ts_us").over(w).isNull(),
        1,
    ).otherwise(0)
    s = ev.select(
        "user_id", "ts_us", "event_id", F.sum(brk).over(w_run).alias("session_no")
    )
    return (
        s.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "event_transitions",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
d AS (
  SELECT user_id, event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS src
  FROM ev
),
c AS (SELECT src, dst, count(*) AS n FROM d WHERE src IS NOT NULL GROUP BY src, dst),
t AS (SELECT src, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY src)
SELECT c.src, c.dst, c.n, round(c.n * 1.0 / t.total, 6) AS p
FROM c JOIN t ON c.src = t.src
ORDER BY c.src, c.dst
""",
    doc="Event-type transition matrix (first-order Markov statistics over per-user event sequences): one lag window per user + one count shuffle; transition probabilities normalized per source state. The sequence-modeling summary a behavioural pipeline derives before training; at 100 TB it is one user-partitioned window + a (|types|^2)-row aggregate.",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = ev.select(
        F.lag("event_type").over(w).alias("src"), F.col("event_type").alias("dst")
    ).filter(F.col("src").isNotNull())
    c = d.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("src").agg(F.sum("n").alias("total"))
    return (
        c.join(F.broadcast(t), "src")
        .select("src", "dst", "n", F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("p"))
        .orderBy("src", "dst")
    )
