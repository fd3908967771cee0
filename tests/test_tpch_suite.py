"""Extended TPC-H-style suite (plans/tpch.py): oracle parity is covered by
test_oracle_parity.py like every registered query; this file pins the PLAN
shapes the module's docstrings promise — dimension broadcasts, pushdown,
no fact-side cartesian, and the dimension-sized windows."""

from __future__ import annotations

from detector_network_processor_spark.plans import all_queries

from conftest import SF_DIR

TPCH_NEW = [
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    # round-6 completion of the 22-query suite
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q11_important_stock",
    "q12_priority_shipping",
    "q20_potential_promotion",
    "q21_waiting_supplier",
]


def plan_of(spark, name, execute=False):
    df = all_queries()[name].fn(spark, SF_DIR)
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_all_registered_with_oracles(spark):
    qs = all_queries()
    for name in TPCH_NEW:
        assert name in qs, name
        assert qs[name].oracle, name


def test_q6_filters_reach_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # shipdate range + discount band + quantity bound all push to parquet
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_no_cartesian_anywhere(spark):
    for name in TPCH_NEW:
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_dimension_joins_broadcast(spark):
    # every multi-join query must enrich via BroadcastHashJoin, and the
    # only SortMergeJoins allowed are fact⋈fact on orderkey (q7/q8/q18)
    for name in ("q7_volume_shipping", "q8_market_share", "q9_product_profit",
                 "q10_returned_items", "q14_promo_revenue", "q16_supplier_part_count",
                 "q17_small_quantity_revenue", "q19_discounted_revenue"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_q13_preaggregates_orders_before_join(spark):
    # the per-order rows never cross the join: HashAggregate(o_custkey)
    # must appear BELOW the join in the plan (i.e. the join input is the
    # aggregated per-customer counts, dimension-sized on both sides)
    plan = plan_of(spark, "q13_customer_distribution")
    join_pos = min(
        (plan.find(j) for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin") if plan.find(j) >= 0),
        default=-1,
    )
    agg_pos = plan.find("HashAggregate", join_pos)
    assert join_pos >= 0 and agg_pos > join_pos, plan[:500]


def test_q15_window_is_on_supplier_dimension(spark):
    # the rank window runs AFTER the per-supplier aggregate: its input is
    # supplier-dimension-sized, so the empty-frame global Window is safe
    plan = plan_of(spark, "q15_top_supplier")
    assert "Window" in plan
    # window input flows from a HashAggregate (the per-suppkey revenue agg)
    w = plan.find("Window")
    assert "HashAggregate" in plan[w:], plan[w : w + 800]


def test_q18_semi_join_for_in_subquery(spark):
    plan = plan_of(spark, "q18_large_volume_customer")
    assert "LeftSemi" in plan


def test_q22_anti_join_for_not_exists(spark):
    plan = plan_of(spark, "q22_sales_opportunity")
    assert "LeftAnti" in plan


def test_q17_avg_subquery_is_broadcast_not_per_row(spark):
    plan = plan_of(spark, "q17_small_quantity_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # part dim + avg-qty table


def test_q2_correlated_min_is_broadcast_joinback(spark):
    # the per-part MIN "subquery" must join back as a broadcast of the
    # part-dimension aggregate, and all four dimensions broadcast too
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan, plan[:800]


def test_q4_exists_is_semi_join_with_lateness_condition(spark):
    plan = plan_of(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    # the non-equi lateness predicate rides INSIDE the join, not a
    # post-join filter over an inner join (which would inflate counts)
    semi = plan[plan.find("LeftSemi") :][:400]
    assert "l_shipdate" in semi, semi


def test_q11_single_fact_aggregation(spark):
    # one HashAggregate pass over lineitem feeds both the scalar total
    # (collected) and the filtered output — the checkpoint guarantees the
    # fact table is not re-scanned for the threshold
    plan = plan_of(spark, "q11_important_stock")
    assert "Scan ExistingRDD" in plan, plan[:400]
    assert "FileScan parquet" not in plan, plan[:800]


def test_q21_semi_then_anti(spark):
    plan = plan_of(spark, "q21_waiting_supplier")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # supplier-side enrichment broadcast
    assert "BroadcastHashJoin" in plan


def _pushed_filter_segments(plan: str) -> list[str]:
    """All PushedFilters blocks in the plan — a query with several parquet
    scans prints one per scan, in an order the test must not depend on."""
    return [seg[:300] for seg in plan.split("PushedFilters")[1:]]


def test_q12_year_filter_reaches_lineitem_scan(spark):
    # the shipdate year window must prune at the parquet scan, BEFORE the
    # orderkey join; only the non-pushable orderdate arithmetic runs
    # post-join. Check EVERY scan's PushedFilters — which scan prints
    # first is plan-layout noise, not the property under test.
    plan = plan_of(spark, "q12_priority_shipping")
    segments = _pushed_filter_segments(plan)
    assert segments
    assert any("l_shipdate" in s for s in segments), segments


def test_q4_order_quarter_filter_reaches_scan(spark):
    plan = plan_of(spark, "q4_order_priority")
    segments = _pushed_filter_segments(plan)
    assert segments
    assert any("o_orderdate" in s for s in segments), segments
