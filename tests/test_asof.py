"""Edge-case tests for the as-of and interval joins (operators/asof.py).

The sf0.01 oracle parity test (test_oracle_parity.py::asof_join_events /
interval_join_events) covers the bulk semantics; these pin the tie-break
and boundary conventions on handcrafted rows where each rule is isolated.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from detector_network_processor_spark.operators.asof import asof_join, interval_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_picks_latest_at_or_before(spark):
    left = _df(spark, [(1, 100, 10)], "k long, t long, lid long")
    right = _df(spark, [(1, 50, 1), (1, 90, 2), (1, 101, 3)], "k long, t long, rid long")
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["rid", "t"], right_tiebreak="rid").collect()
    assert len(out) == 1
    assert out[0]["asof_rid"] == 2  # 90 <= 100 < 101; latest wins


def test_asof_inclusive_and_tiebreak(spark):
    # Right rows at exactly the left timestamp match (inclusive), and among
    # equal timestamps the greatest tiebreak value wins.
    left = _df(spark, [(1, 100, 10)], "k long, t long, lid long")
    right = _df(spark, [(1, 100, 7), (1, 100, 9), (1, 100, 8)], "k long, t long, rid long")
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["rid"], right_tiebreak="rid").collect()
    assert out[0]["asof_rid"] == 9


def test_asof_no_match_yields_null_and_keys_isolated(spark):
    left = _df(spark, [(1, 100, 10), (2, 100, 20)], "k long, t long, lid long")
    right = _df(spark, [(2, 60, 5)], "k long, t long, rid long")
    rows = {r["lid"]: r for r in asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["rid"], right_tiebreak="rid").collect()}
    assert rows[10]["asof_rid"] is None  # key 1 never saw key 2's rows
    assert rows[20]["asof_rid"] == 5


def test_asof_latest_row_taken_atomically(spark):
    # A NULL inside the latest matching right row must NOT fall back to an
    # older row's value for that column: right rows (t=1, a=5, b=7) and
    # (t=2, a=NULL, b=9) → the as-of result at t=3 is (NULL, 9), not (5, 9).
    left = _df(spark, [(1, 3, 10)], "k long, t long, lid long")
    right = spark.createDataFrame(
        [(1, 1, 5, 7), (1, 2, None, 9)], "k long, t long, a long, b long"
    )
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["a", "b"], right_tiebreak="b").collect()
    assert out[0]["asof_a"] is None
    assert out[0]["asof_b"] == 9


def test_interval_join_closed_boundaries(spark):
    iv = _df(spark, [(1, 100, 200, 1)], "k long, s long, e long, ivid long")
    pts = _df(spark, [(1, 99, 1), (1, 100, 2), (1, 200, 3), (1, 201, 4)],
              "k long, pt long, pid long")
    hits = sorted(r["pid"] for r in interval_join(
        iv, pts, on="k", start="s", end="e", point_time="pt",
        bucket_width=101).collect())
    assert hits == [2, 3]  # [start, end] closed on both ends


def test_interval_join_crossing_bucket_boundary(spark):
    # Interval spans two buckets; a point in the second bucket still pairs.
    iv = _df(spark, [(1, 95, 105, 1)], "k long, s long, e long, ivid long")
    pts = _df(spark, [(1, 104, 1)], "k long, pt long, pid long")
    out = interval_join(iv, pts, on="k", start="s", end="e",
                        point_time="pt", bucket_width=100).collect()
    assert len(out) == 1 and out[0]["pid"] == 1


def test_asof_plan_has_single_shuffle(spark):
    # The scale contract: one Exchange for the union'd input, no join node.
    left = _df(spark, [(1, 100, 10)], "k long, t long, lid long")
    right = _df(spark, [(1, 50, 1)], "k long, t long, rid long")
    plan = asof_join(left, right, on="k", left_time="t", right_time="t",
                     right_cols=["rid"]).orderBy("lid")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "Join" not in plan, plan
