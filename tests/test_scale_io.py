"""Plan-shape proofs of the 100 TB storage posture (io.py helpers).

These pin the two layout techniques that decide whether a query scans a
shard or the whole lake:

- partition pruning: a filter on a partition column must reach the scan as
  a PartitionFilter (directories skipped) — not a post-scan Filter;
- bucketed co-located joins: two tables bucketed on the join key must join
  with ZERO Exchange (the shuffle was paid at write time).

Both are asserted on the executed plan text, not on timings, so they hold
on any cluster size.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR_SMALL
from detector_network_processor_spark.io import (
    load_table,
    ts_to_us,
    write_bucketed,
    write_partitioned,
)

_DAY_US = 86_400_000_000


def _executed_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only after execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev_raw = load_table(spark, SF_DIR_SMALL, "events")
    ev = (
        ev_raw.withColumn("ts_us", ts_to_us(ev_raw))
        .withColumn("day", F.expr(f"ts_us div {_DAY_US}"))
        .drop("ts_us")
    )
    write_partitioned(ev, path, ["day"])

    days = [r.day for r in spark.read.parquet(path).select("day").distinct().collect()]
    assert len(days) > 1, "fixture spans one day; pruning test needs several"
    one_day = spark.read.parquet(path).filter(F.col("day") == days[0])

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [isnotnull(day" in plan or "PartitionFilters: [(day" in plan, plan
    # Only the matching directory's files are actually read
    # (inputFiles() would list the whole relation pre-pruning).
    read_files = [
        r[0] for r in one_day.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files and all(f"/day={days[0]}/" in f for f in read_files), read_files

    # Correctness: partition column round-trips.
    n_expected = ev.filter(F.col("day") == days[0]).count()
    assert one_day.count() == n_expected


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_DIR_SMALL, "orders")
        cust = load_table(spark, SF_DIR_SMALL, "customer")
        write_bucketed(orders, "t_orders_b", "o_custkey", 8, sort_col="o_custkey")
        write_bucketed(cust, "t_cust_b", "c_custkey", 8, sort_col="c_custkey")

        joined = (
            spark.table("t_orders_b")
            .join(spark.table("t_cust_b"), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _executed_plan(joined.select("c_mktsegment", "n"))
        # The join itself must not shuffle either side: the only Exchange
        # allowed is the one for the groupBy on a different key.
        join_section = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning(o_custkey" not in plan, plan
        assert "Exchange hashpartitioning(c_custkey" not in plan, plan

        # Same result as the plain shuffled join.
        plain = (
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_events_bucketed_station_agg_and_join_no_exchange(spark):
    """The materialized event layout (day-partitioned + station-bucketed,
    io.materialize_events_bucketed): per-station aggregation and the
    enrichment join against a same-bucketed station dimension must both
    run with ZERO Exchange — the station shuffle was paid once at ingest
    (VERDICT r4 next-round #4; reference shards per-station state by
    station hash, src/supervision/station.cpp:30-34)."""
    from detector_network_processor_spark.io import (
        materialize_events_bucketed,
        materialize_station_dim_bucketed,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        materialize_events_bucketed(spark, SF_DIR_SMALL, table="t_ev_b", n_buckets=8)
        ev = spark.table("t_ev_b")

        # (a) per-station aggregation: no Exchange anywhere — partial and
        # final agg collapse onto the bucketed scan.
        agg = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts")
        )
        plan_a = _executed_plan(agg)
        assert "Exchange" not in plan_a, plan_a

        # (b) enrichment join against the same-bucketed station dimension:
        # no Exchange on either join input (the groupBy on a non-key column
        # downstream is allowed its own shuffle).
        dim = (
            ev.select(F.col("user_id").alias("hash"))
            .distinct()
            .withColumn("region", F.pmod("hash", F.lit(5)))
        )
        materialize_station_dim_bucketed(dim, table="t_st_b", key_col="hash", n_buckets=8)
        joined = ev.join(
            spark.table("t_st_b"), ev["user_id"] == F.col("hash")
        ).groupBy("region").agg(F.count(F.lit(1)).alias("n"))
        plan_b = _executed_plan(joined)
        assert "Exchange hashpartitioning(user_id" not in plan_b, plan_b
        assert "Exchange hashpartitioning(hash" not in plan_b, plan_b

        # (c) day-partition pruning still works on top of bucketing.
        one_day = ev.select("day").distinct().limit(1).collect()[0]["day"]
        pruned = ev.filter(F.col("day") == one_day)
        plan_c = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan_c, plan_c
        assert (
            "PartitionFilters: [isnotnull(day" in plan_c
            or "day#" in plan_c.split("PartitionFilters")[1][:120]
        ), plan_c
        assert pruned.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_ev_b")
        spark.sql("DROP TABLE IF EXISTS t_st_b")
