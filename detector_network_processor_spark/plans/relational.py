"""Relational parity layer (SURVEY.md §2.10 + §2.2/§2.4/§2.6/§2.7 analogs).

The reference has no SQL surface; its operators are pipeline stages. Here each
stage class is expressed as a declarative DataFrame plan over the driver's
TPC-H-ish fixtures so Catalyst supplies pushdown/pruning/join-selection
(SURVEY.md §4.2), paired with a DuckDB oracle.

Scale notes are attached per query: every plan avoids driver-side loops,
broadcasts dimension tables explicitly, and expresses range/band joins as
bucketed equi-joins so they hash-partition instead of degenerating into
cross products at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table, ts_to_us
from . import register

# --------------------------------------------------------------------------
# TPC-H-style scan/filter/agg/join/sort/limit parity (SURVEY §2.10)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS sum_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS sum_base_price,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0, 4) AS sum_disc_price,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0, 4) AS sum_charge,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 4) AS avg_qty,
       round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) / 10000.0 / count(*), 4) AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: scan → filter (pushdown) → hash agg. Parity for F1-class filters + A-class aggregation (SURVEY §2.2, §2.6). Money/quantity sums run in exact scaled integers (2/4/6 dp): distributed double summation is order-dependent and breaks cross-engine hashing at larger SFs.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    q2 = F.round(F.col("l_quantity") * 100).cast("long")
    p2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d4 = F.round(disc_price * 10_000).cast("long")
    c6 = F.round(disc_price * (1 + F.col("l_tax")) * 1_000_000).cast("long")
    disc4 = F.round(F.col("l_discount") * 10_000).cast("long")
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(q2) / 100.0, 4).alias("sum_qty"),
            F.round(F.sum(p2) / 100.0, 4).alias("sum_base_price"),
            F.round(F.sum(d4) / 10_000.0, 4).alias("sum_disc_price"),
            F.round(F.sum(c6) / 1_000_000.0, 4).alias("sum_charge"),
            F.round(F.sum(q2) / 100.0 / cnt, 4).alias("avg_qty"),
            F.round(F.sum(p2) / 100.0 / cnt, 4).alias("avg_price"),
            F.round(F.sum(disc4) / 10_000.0 / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0, 4) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: 3-way join + agg + top-k. Parity for J1 joins + sort/limit (SURVEY §2.4, §2.10).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000).cast("long")) / 10_000.0, 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle="""
SELECT n_name,
       round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) / 10000.0, 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    doc="TPC-H Q5 shape: 6-way join with dimension broadcast. Parity for multi-join plans (SURVEY §2.4).",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000).cast("long")) / 10_000.0, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "join_broadcast_parts",
    oracle="""
SELECT p_brand,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS sum_qty,
       count(*)                  AS n_items,
       round(CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 4) AS avg_retail
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
    doc="J1 broadcast enrichment join analog (reference src/supervision/station.cpp:30-34): fact × small dim must be a BroadcastHashJoin, never a shuffle join.",
)
def join_broadcast_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0, 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.round(F.col("p_retailprice") * 100).cast("long")) / 100.0 / F.count(F.lit(1)), 4
            ).alias("avg_retail"),
        )
        .orderBy("p_brand")
    )


@register(
    "top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="Sort + limit parity (SURVEY §2.10 — absent in reference, Spark built-in). Top-k is TakeOrderedAndProject, no global sort.",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


@register(
    "set_ops_customers",
    oracle="""
WITH with_orders AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
     building    AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT custkey, 'no_order_building' AS tag
FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM with_orders) t
UNION ALL
SELECT custkey, 'ordered_building' AS tag
FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM with_orders) t
ORDER BY tag, custkey
""",
    doc="Set-operation parity: union/intersect/except (SURVEY §2.10).",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey")).distinct()
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    no_order = building.exceptAll(building.intersect(orders)).select("custkey", F.lit("no_order_building").alias("tag"))
    ordered = building.intersect(orders).select("custkey", F.lit("ordered_building").alias("tag"))
    return no_order.unionAll(ordered).orderBy("tag", "custkey")


@register(
    "distinct_agg_orders",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*)                  AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 2) AS sum_total
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    doc="Distinct aggregation parity (SURVEY §2.10). Price sum runs in integer cents: distributed double summation is order-dependent and diverges from DuckDB's at sf0.1 row counts (caught by the sf0.1 parity sweep), while TPC-H prices are exact 2-decimal values.",
)
def distinct_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2
            ).alias("sum_total"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "rollup_lineitem",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS sum_qty,
       count(*)                      AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    doc="Rollup/grouping-sets parity (SURVEY §2.10).",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0, 4).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


# --------------------------------------------------------------------------
# events-stream analytics: windows, rates, counters, sessions (SURVEY §2.6-2.7)
# The `events` fixture plays the role of the reference's event stream; ts may
# arrive as int64 ns or timestamp[us] depending on fixture vintage — io.ts_to_us
# normalizes either to exact epoch-µs, matched against DuckDB epoch_us.
# --------------------------------------------------------------------------


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts converted to exact int64 microseconds (ts_us)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", ts_to_us(ev)).drop("ts")


_EVENTS_US_SQL = "SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props FROM events"


@register(
    "window_running_total",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL})
SELECT event_id, user_id, ts_us,
       row_number() OVER w                  AS rn,
       round(sum(value) OVER w, 4)          AS running_value
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, rn
""",
    doc="Running per-key aggregates — A2 data_series analog (reference include/analysis/detectorstation.h:137-139).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        _events_us(spark, sf_dir)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.row_number().over(w).alias("rn"),
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
        .orderBy("user_id", "rn")
    )


@register(
    "window_sliding_stats",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL})
SELECT event_id, user_id,
       round(avg(value) OVER w, 6) AS mean_value,
       CASE WHEN count(*) OVER w >= 2 THEN round(stddev_samp(value) OVER w, 6) END AS stddev_value,
       count(*) OVER w AS n_in_window
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    doc="Sliding mean/stddev over last K samples — A2 ring-buffer stats (reference src/analysis/detectorstation.cpp:50-55).",
)
def window_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(-4, 0)
    return (
        _events_us(spark, sf_dir)
        .select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), 6).alias("mean_value"),
            F.when(F.count(F.lit(1)).over(w) >= 2, F.round(F.stddev_samp("value").over(w), 6)).alias("stddev_value"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "counter_progress",
    oracle="""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_id % 65536 AS counter FROM events
), d AS (
  SELECT user_id, counter,
         lag(counter) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
  FROM ev
)
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL THEN 0
                WHEN counter <= prev THEN counter + (65535 - prev)
                ELSE counter - prev END) AS BIGINT) AS counter_progress,
       count(*) AS incoming
FROM d
GROUP BY user_id
ORDER BY user_id
""",
    doc="A3 wrapping-u16 counter progress, exact reference arithmetic incl. the 65535 wrap constant (src/analysis/detectorstation.cpp:37-48).",
)
def counter_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = _events_us(spark, sf_dir).withColumn("counter", F.col("event_id") % 65536)
    d = ev.withColumn("prev", F.lag("counter").over(w))
    progress = (
        F.when(F.col("prev").isNull(), F.lit(0))
        .when(F.col("counter") <= F.col("prev"), F.col("counter") + (65535 - F.col("prev")))
        .otherwise(F.col("counter") - F.col("prev"))
    )
    return (
        d.groupBy("user_id")
        .agg(F.sum(progress).alias("counter_progress"), F.count(F.lit(1)).alias("incoming"))
        .orderBy("user_id")
    )


_HOUR_US = 3_600_000_000


@register(
    "rate_tumbling",
    oracle=f"""
SELECT user_id, epoch_us(ts) // {_HOUR_US} AS bucket, count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) / 1000000.0, 4) AS sum_value
FROM events
GROUP BY user_id, bucket
ORDER BY user_id, bucket
""",
    doc="A1 rate_measurement tumbling interval counts (reference src/analysis/detectorstation.cpp:33-34). Map-side partial agg + single shuffle.",
)
def rate_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events_us(spark, sf_dir)
        .withColumn("bucket", F.expr(f"ts_us div {_HOUR_US}"))
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000.0, 4).alias("sum_value"))
        .orderBy("user_id", "bucket")
    )


@register(
    "rate_sliding_stats",
    oracle=f"""
WITH rate AS (
  SELECT user_id, epoch_us(ts) // {_HOUR_US} AS bucket, count(*) AS n_events
  FROM events GROUP BY user_id, bucket
)
SELECT user_id, bucket,
       round(avg(n_events) OVER w, 6) AS mean_rate,
       CASE WHEN count(*) OVER w >= 2 THEN round(stddev_samp(n_events) OVER w, 6) END AS stddev_rate
FROM rate
WINDOW w AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
ORDER BY user_id, bucket
""",
    doc="A1 mean/stddev of rate over last 10 intervals (reference rate_measurement: N=10 windows).",
)
def rate_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    rate = (
        _events_us(spark, sf_dir)
        .withColumn("bucket", F.expr(f"ts_us div {_HOUR_US}"))
        .groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("user_id").orderBy("bucket").rowsBetween(-9, 0)
    return rate.select(
        "user_id",
        "bucket",
        F.round(F.avg("n_events").over(w), 6).alias("mean_rate"),
        F.when(F.count(F.lit(1)).over(w) >= 2, F.round(F.stddev_samp("n_events").over(w), 6)).alias("stddev_rate"),
    ).orderBy("user_id", "bucket")


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "sessionize_events",
    oracle=f"""
WITH ev AS ({_EVENTS_US_SQL}),
brk AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM ev
),
sess AS (
  SELECT user_id, event_id, ts_us,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
  FROM brk
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
       max(ts_us) - min(ts_us) AS duration_us
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    doc="Gap-based sessionization — candidate-generation phase of the §2.5 coincidence operator and W3 group-timeout analog.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev = _events_us(spark, sf_dir)
    brk = ev.withColumn(
        "brk",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US, F.lit(1)).otherwise(F.lit(0)),
    )
    sess = brk.withColumn("session_id", F.sum("brk").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


_PAIR_WINDOW_US = 5_000_000  # 5 s band for the events fixture


@register(
    "coincidence_pairs",
    oracle=f"""
SELECT a.event_id AS event_a, b.event_id AS event_b,
       a.user_id AS user_a, b.user_id AS user_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
FROM events a
JOIN events b
  ON a.event_id < b.event_id
 AND a.user_id <> b.user_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {_PAIR_WINDOW_US}
ORDER BY event_a, event_b
""",
    doc="J2 time-band self-join (simple_coincidence criterion C4, reference src/analysis/simplecoincidence.cpp:12-15). Spark side is a bucketed equi-join (each row replicated to 2 adjacent time buckets) so it scales as a hash join, not a cross product.",
)
def coincidence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir).select("event_id", "user_id", "ts_us")
    # Band join as bucketed equi-join: bucket width == band width, so any pair
    # with |dt| <= W sits in the same or an adjacent bucket. Replicate the
    # left side into {b-1, b, b+1} and equi-join on bucket — Catalyst plans a
    # shuffled hash join, which partitions cleanly at 100 TB (no cross
    # product). The right side keeps a single bucket per row, so each
    # qualifying (a, b) pair joins exactly once (no dedup needed).
    bkt = F.expr(f"ts_us div {_PAIR_WINDOW_US}")
    a = ev.withColumn("bucket", F.explode(F.array(bkt - 1, bkt, bkt + 1))).select(
        F.col("event_id").alias("event_a"), F.col("user_id").alias("user_a"), F.col("ts_us").alias("ts_a"), "bucket"
    )
    b = ev.withColumn("bucket", bkt).select(
        F.col("event_id").alias("event_b"), F.col("user_id").alias("user_b"), F.col("ts_us").alias("ts_b"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("event_a") < F.col("event_b"))
            & (F.col("user_a") != F.col("user_b"))
            & (F.abs(F.col("ts_a") - F.col("ts_b")) <= _PAIR_WINDOW_US)
        )
        .select("event_a", "event_b", "user_a", "user_b", (F.col("ts_b") - F.col("ts_a")).alias("dt_us"))
        .orderBy("event_a", "event_b")
    )


_HIST_BIN_US = 500_000  # 0.5 s bins over the ±5 s band → 20 bins


@register(
    "pair_delta_histogram",
    oracle=f"""
WITH pairs AS (
  SELECT least(a.user_id, b.user_id) AS user_lo, greatest(a.user_id, b.user_id) AS user_hi,
         epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
  FROM events a
  JOIN events b
    ON a.event_id < b.event_id
   AND a.user_id <> b.user_id
   AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {_PAIR_WINDOW_US}
)
SELECT user_lo, user_hi,
       (dt_us + {_PAIR_WINDOW_US}) // {_HIST_BIN_US} AS bin,
       count(*) AS n
FROM pairs
GROUP BY user_lo, user_hi, bin
ORDER BY user_lo, user_hi, bin
""",
    doc="A7 per-pair Δt histogram: explode pairs → normalized pair key (greatest/least, reference src/analysis/stationcoincidence.cpp:72) → width_bucket count.",
)
def pair_delta_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = coincidence_pairs(spark, sf_dir)
    return (
        pairs.select(
            F.least("user_a", "user_b").alias("user_lo"),
            F.greatest("user_a", "user_b").alias("user_hi"),
            F.expr(f"(dt_us + {_PAIR_WINDOW_US}) div {_HIST_BIN_US}").alias("bin"),
        )
        .groupBy("user_lo", "user_hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("user_lo", "user_hi", "bin")
    )


@register(
    "semi_anti_join",
    oracle="""
SELECT 'with_lineitem' AS tag, count(*) AS n, round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS total
FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
UNION ALL
SELECT 'without_lineitem' AS tag, count(*) AS n, round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS total
FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
ORDER BY tag
""",
    doc="Left-semi / left-anti join parity (SURVEY §2.10 — absent in reference, Spark built-in).",
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    heavy = li.filter(F.col("l_quantity") > 45)
    semi = (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 4).alias("total"))
        .select(F.lit("with_lineitem").alias("tag"), "n", "total")
    )
    anti = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 4).alias("total"))
        .select(F.lit("without_lineitem").alias("tag"), "n", "total")
    )
    return semi.unionAll(anti).orderBy("tag")


@register(
    "correlated_exists",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="Correlated EXISTS subquery parity (SURVEY §2.10): Catalyst rewrites to a semi join.",
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_base_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@register(
    "percentiles",
    oracle="""
SELECT l_returnflag,
       round(median(l_extendedprice), 4)                        AS median_price,
       round(quantile_cont(l_extendedprice, 0.95), 4)           AS p95_price,
       round(min(l_extendedprice), 4)                           AS min_price,
       round(max(l_extendedprice), 4)                           AS max_price
FROM lineitem GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="Exact percentile aggregation parity (SURVEY §2.10). (approx_percentile/HLL also exist in Spark; exact forms are the oracle-comparable ones.)",
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
            F.round(F.min("l_extendedprice"), 4).alias("min_price"),
            F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "scalar_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name)                                  AS name_upper,
       substr(p_type, 1, 6)                           AS type_prefix,
       length(p_name)                                 AS name_len,
       replace(p_brand, 'Brand#', 'B')                AS brand_short,
       round(sqrt(p_retailprice), 6)                  AS price_sqrt,
       round(ln(p_retailprice + 1), 6)                AS price_ln,
       abs(p_size - 25)                               AS size_dev,
       CAST(trunc(p_retailprice) AS BIGINT) % 7       AS price_mod
FROM part
ORDER BY p_partkey
LIMIT 500
""",
    doc="Scalar string/math function library parity (SURVEY §2.10: the reference has no general scalar library; Spark functions module supplies it).",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_type", 1, 6).alias("type_prefix"),
            F.length("p_name").alias("name_len"),
            F.expr("replace(p_brand, 'Brand#', 'B')").alias("brand_short"),
            F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            (F.col("p_retailprice").cast("bigint") % 7).alias("price_mod"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@register(
    "date_functions",
    oracle="""
SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
       count(*) AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS total,
       min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day
FROM orders
GROUP BY y, m
ORDER BY y, m
""",
    doc="Date/time function parity (SURVEY §2.10).",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 4).alias("total"),
            F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
        )
        .orderBy("y", "m")
    )


@register(
    "case_pivot",
    oracle="""
SELECT n_name,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    doc="Pivot (conditional aggregation) parity (SURVEY §2.10); Spark side uses the native pivot operator.",
)
def case_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    piv = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )
    return piv.select(
        "n_name",
        F.col("F").alias("f_orders"),
        F.col("O").alias("o_orders"),
        F.col("P").alias("p_orders"),
    ).orderBy("n_name")


@register(
    "cube_orders",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)                         AS n_orders,
       round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    doc="CUBE grouping-sets parity (SURVEY §2.10): all 4 grouping combinations in one pass (Spark expands to a single Expand + hash agg — one shuffle, not 4 scans).",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 4).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "window_rank_suite",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       dense_rank()   OVER w                            AS drnk,
       ntile(4)       OVER w                            AS quartile,
       round(percent_rank() OVER w, 6)                  AS prnk,
       round(cume_dist() OVER w, 6)                     AS cdist,
       lag(o_orderkey)  OVER w                          AS prev_key,
       lead(o_orderkey) OVER w                          AS next_key,
       first_value(o_orderkey) OVER w                   AS top_key,
       nth_value(o_orderkey, 2) OVER w                  AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_orderpriority, drnk, o_orderkey
LIMIT 2000
""",
    doc="Window-function library parity (SURVEY §2.10): rank/ntile/percent_rank/cume_dist/lag/lead/first/nth in ONE window spec — one shuffle+sort serves all nine functions.",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prnk"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
            F.lag("o_orderkey").over(w).alias("prev_key"),
            F.lead("o_orderkey").over(w).alias("next_key"),
            F.first("o_orderkey").over(w).alias("top_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .orderBy("o_orderpriority", "drnk", "o_orderkey")
        .limit(2000)
    )


@register(
    "approx_aggregates",
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS exact_distinct,
       true                      AS approx_distinct_within_5pct,
       true                      AS approx_p50_within_5pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc=(
        "Approximate aggregation (SURVEY §2.10: approx_count_distinct / "
        "percentile_approx). Sketch values differ across engines by design, "
        "so the oracle-checkable contract is the ERROR BOUND: the query "
        "emits booleans asserting Spark's HLL estimate and approximate "
        "median land within 5% of the exact values computed in the same "
        "pass; the oracle pins the exact values and expects the booleans "
        "true. At 100 TB the approx forms are the only affordable ones — "
        "fixed-size sketches, map-side combinable, no distinct shuffle."
    ),
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    rel_err = lambda approx, exact: F.abs(approx - exact) / exact  # noqa: E731
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact_distinct"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_apx_d"),
            F.expr("percentile(o_totalprice, 0.5)").alias("_exact_p50"),
            F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("_apx_p50"),
        )
        .select(
            "o_orderpriority",
            "exact_distinct",
            (rel_err(F.col("_apx_d"), F.col("exact_distinct")) < 0.05).alias(
                "approx_distinct_within_5pct"
            ),
            (rel_err(F.col("_apx_p50"), F.col("_exact_p50")) < 0.05).alias(
                "approx_p50_within_5pct"
            ),
        )
        .orderBy("o_orderpriority")
    )


def register_base_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


_DAY_US = 86_400_000_000
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "assembly_count_based",
    oracle=f"""
WITH m AS (
  SELECT user_id, epoch_us(ts) // {_HOUR_US} AS bucket,
         (event_id % 4) + 2 AS expected, CAST(event_id AS VARCHAR) AS payload
  FROM events
)
SELECT user_id, bucket, min(expected) AS expected_n, count(*) AS n_parts,
       string_agg(payload, ',' ORDER BY payload) AS parts
FROM m GROUP BY user_id, bucket
HAVING count(*) >= min(expected)
ORDER BY user_id, bucket
""",
    doc="S3 count-based reassembly analog (reference include/source/mqtt.h:169-212): emit a group only once its declared multiplicity is reached.",
)
def assembly_count_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.assembly import count_based_assembly

    m = _events_us(spark, sf_dir).select(
        "user_id",
        F.expr(f"ts_us div {_HOUR_US}").alias("bucket"),
        ((F.col("event_id") % 4) + 2).alias("expected"),
        F.col("event_id").cast("string").alias("payload"),
    )
    out = count_based_assembly(m, ["user_id", "bucket"], "expected", "payload")
    return out.select(
        "user_id",
        "bucket",
        "expected_n",
        "n_parts",
        F.concat_ws(",", "parts").alias("parts"),
    ).orderBy("user_id", "bucket")


@register(
    "assembly_kv_pivot",
    oracle=f"""
WITH kv AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS bucket, event_type AS name,
         json_extract_string(props, '$.k') AS value,
         epoch_us(ts) AS ts_us, event_id
  FROM events
), firsts AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, bucket, name ORDER BY ts_us, event_id) AS rn
    FROM kv
  ) WHERE rn = 1
)
SELECT user_id, bucket,
       {", ".join(f"max(CASE WHEN name = '{n}' THEN value END) AS {n}" for n in _EVENT_TYPES)},
       {" + ".join(f"CASE WHEN max(CASE WHEN name = '{n}' THEN 1 END) = 1 THEN {1 << i} ELSE 0 END" for i, n in enumerate(_EVENT_TYPES))} AS bitmask,
       {" + ".join(f"CASE WHEN max(CASE WHEN name = '{n}' THEN 1 END) = 1 THEN {1 << i} ELSE 0 END" for i, n in enumerate(_EVENT_TYPES))} = {(1 << len(_EVENT_TYPES)) - 1} AS complete
FROM firsts GROUP BY user_id, bucket
ORDER BY user_id, bucket
""",
    doc="S4 key-value pivot assembly analog (reference include/source/mqtt.h:126-167): first value per expected key pivoted to columns + completion bitmask.",
)
def assembly_kv_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.assembly import kv_pivot_assembly

    kv = _events_us(spark, sf_dir).select(
        "user_id",
        F.expr(f"ts_us div {_DAY_US}").alias("bucket"),
        F.col("event_type").alias("name"),
        F.get_json_object("props", "$.k").alias("value"),
        "ts_us",
        "event_id",
    )
    return kv_pivot_assembly(
        kv, ["user_id", "bucket"], "name", "value", _EVENT_TYPES, ["ts_us", "event_id"]
    ).orderBy("user_id", "bucket")


@register(
    "assembly_eav_collect",
    oracle=f"""
WITH eav AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS bucket,
         event_type || '=' || json_extract_string(props, '$.k') AS item
  FROM events
)
SELECT user_id, bucket, count(*) AS n_items,
       string_agg(item, ',' ORDER BY item) AS items
FROM eav GROUP BY user_id, bucket
ORDER BY user_id, bucket
""",
    doc="S5 EAV accumulation analog (reference include/source/mqtt.h:250-349): per-key windowed collection committed as one ordered record.",
)
def assembly_eav_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.assembly import eav_collect

    eav = _events_us(spark, sf_dir).select(
        "user_id",
        F.expr(f"ts_us div {_DAY_US}").alias("bucket"),
        F.col("event_type").alias("name"),
        F.get_json_object("props", "$.k").alias("value"),
    )
    return eav_collect(eav, ["user_id", "bucket"], "name", "value").orderBy("user_id", "bucket")


@register(
    "eav_json_stats",
    oracle="""
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS mean_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k,
       count(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="S4/S5 EAV telemetry pivot analog: semi-structured payload extraction + typed aggregation (reference include/source/mqtt.h:250-349).",
)
def eav_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 6).alias("mean_k"),
            F.max(k).alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, metric, value FROM (
  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
  UNION ALL
  SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
)
ORDER BY p_partkey, metric
""",
    doc=(
        "Wide-to-long unpivot (melt) via Spark's native unpivot operator — "
        "the §2.10 relational-surface complement of pivot (case_pivot). "
        "Plans as a single Expand node: one scan, rows multiplied in the "
        "map stage, no shuffle before the presentation sort."
    ),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(
        ["p_partkey"], ["retailprice", "size"], "metric", "value"
    ).orderBy("p_partkey", "metric")


@register(
    "corr_lineitem",
    oracle="""
WITH s AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_quantity * 100) AS BIGINT) AS q,
         CAST(round(l_discount * 10000) AS BIGINT) AS d,
         CAST(round(l_tax * 10000) AS BIGINT) AS t
  FROM lineitem
),
m AS (
  SELECT flag, count(*) AS n,
         CAST(sum(q) AS BIGINT) AS sq, CAST(sum(d) AS BIGINT) AS sd, CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(q*q) AS BIGINT) AS sqq, CAST(sum(d*d) AS BIGINT) AS sdd, CAST(sum(t*t) AS BIGINT) AS stt,
         CAST(sum(q*d) AS BIGINT) AS sqd, CAST(sum(d*t) AS BIGINT) AS sdt
  FROM s GROUP BY flag
)
SELECT flag, n,
       round((CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
         AS corr_qty_discount,
       round((CAST(n AS DOUBLE) * CAST(sdt AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(st AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 6)
         AS corr_discount_tax
FROM m
ORDER BY flag
""",
    doc=(
        "Per-group Pearson correlation with EXACT integer moments: the five "
        "sums (x, y, x^2, y^2, xy) accumulate as int64 over fixed-point "
        "scaled values (quantity x100, discount/tax x10000 — per-row "
        "products stay <= 1e8, so the running sums fit int64 to sf~1000), "
        "making the distributed aggregation order-free; the final "
        "correlation is one deterministic IEEE double expression over the "
        "exact moments — the cross-engine-safe alternative to corr()'s "
        "float accumulators, at the cost of one map-side-combined shuffle."
    ),
)
def corr_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("q"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("d"),
        F.round(F.col("l_tax") * 10000).cast("long").alias("t"),
    )
    m = li.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("d").alias("sd"),
        F.sum("t").alias("st"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("d") * F.col("t")).alias("sdt"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        nd = F.col("n").cast("double")
        num = nd * F.col(sxy).cast("double") - F.col(sx).cast("double") * F.col(sy).cast("double")
        den = F.sqrt(
            (nd * F.col(sxx).cast("double") - F.col(sx).cast("double") * F.col(sx).cast("double"))
            * (nd * F.col(syy).cast("double") - F.col(sy).cast("double") * F.col(sy).cast("double"))
        )
        return F.round(num / den, 6)

    return m.select(
        "flag",
        "n",
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_discount"),
        corr("sdt", "sd", "st", "sdd", "stt").alias("corr_discount_tax"),
    ).orderBy("flag")


@register(
    "customer_nation_quartiles",
    oracle="""
SELECT c_custkey, c_mktsegment, c_nationkey,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_nationkey, c_custkey) AS VARCHAR) AS quartile
FROM customer
ORDER BY c_custkey
""",
    doc=(
        "Exact per-segment quartiles over a HEAVY-TIES integer order key "
        "(25 distinct nations per ~300-customer segment), computed by the "
        "map-only distributed ntile (operators/rank.py): every quartile "
        "boundary falls INSIDE a nation cell here, so this query drives "
        "the operator's straddle branch — the (group, CELL)-keyed "
        "row_number window over boundary cells only — under driver "
        "adjudication, complementing ccnet_ppl_buckets whose continuous "
        "keys mostly exercise the zero-exchange label branch. No "
        "per-segment sort task anywhere; non-straddling nations get their "
        "quartile from the broadcast verdict join."
    ),
)
def customer_nation_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import exact_ntile

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    return (
        exact_ntile(
            cust,
            "c_mktsegment",
            ["c_nationkey", "c_custkey"],
            n_buckets=4,
            bucket_col="quartile",
        )
        .select("c_custkey", "c_mktsegment", "c_nationkey", "quartile")
        .orderBy("c_custkey")
    )
