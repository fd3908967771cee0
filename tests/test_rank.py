"""Distributed exact ntile (operators/rank.py): bit-identical to the
window ntile, scale-safe (no one-task-per-group sort), invariant under
partition count."""

from __future__ import annotations

import pyspark.sql.functions as F

from detector_network_processor_spark.operators.rank import exact_ntile
from detector_network_processor_spark.plans.llm import ccnet_ppl_buckets_plan

from conftest import SF_DIR


def _window_ntile(df, group_col, order_cols, n_buckets):
    from pyspark.sql import Window

    nt = F.ntile(n_buckets).over(
        Window.partitionBy(group_col).orderBy(*order_cols)
    )
    return df.withColumn("bucket", nt.cast("string"))


def test_matches_window_ntile_on_awkward_group_sizes(spark):
    """Group sizes chosen to hit every closed-form branch: n < buckets,
    n == buckets, n % buckets in {0, 1, 2}, and a 1-row group."""
    rows = []
    sizes = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 8, "f": 9, "g": 100}
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            # non-monotonic keys so the sort actually reorders
            rows.append((g, (i * 48271) % 1009, i))
            i += 1
    df = spark.createDataFrame(rows, "g string, k long, id long")
    got = exact_ntile(df, "g", ["k", "id"], 3, n_partitions=7).collect()
    want = _window_ntile(df, "g", ["k", "id"], 3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_ccnet_distributed_equals_window_impl(spark):
    d = ccnet_ppl_buckets_plan(spark, SF_DIR, exact=True).collect()
    w = ccnet_ppl_buckets_plan(spark, SF_DIR, exact=True, exact_impl="window").collect()
    assert sorted(map(tuple, d)) == sorted(map(tuple, w))
    spark.catalog.clearCache()


def test_ccnet_distributed_invariant_under_partition_count(spark):
    base = ccnet_ppl_buckets_plan(spark, SF_DIR, exact=True).collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "257")
        wide = ccnet_ppl_buckets_plan(spark, SF_DIR, exact=True).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert sorted(map(tuple, base)) == sorted(map(tuple, wide))
    spark.catalog.clearCache()


def test_ccnet_registered_plan_has_no_sort_window(spark):
    """The registered exact mode must contain NO Window operator — the
    whole point of the distributed ntile is that no per-language sort
    serializes onto one task. The rank pass is a range exchange +
    MapInPandas; the final orderBy(doc_id) is a range sort, not a Window."""
    from detector_network_processor_spark.plans import all_queries

    df = all_queries()["ccnet_ppl_buckets"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "MapInPandas" in plan
    assert "Exchange rangepartitioning" in plan
    spark.catalog.clearCache()
