"""Distributed exact ntile (operators/rank.py): bit-identical to the
window ntile, scale-safe (no one-task-per-group sort), invariant under
partition count."""

from __future__ import annotations

import pandas as pd
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
    got = exact_ntile(df, "g", ["k", "id"], 3).collect()
    want = _window_ntile(df, "g", ["k", "id"], 3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_null_group_key_matches_window_ntile(spark):
    """Pass 1's Spark groupBy counts a null group; the Arrow pass must see
    the same group (pandas dropna would silently drop it and misalign the
    np.repeat lengths)."""
    rows = [("a", 5, 0), ("a", 1, 1), (None, 9, 2), (None, 2, 3), (None, 4, 4), ("b", 7, 5)]
    df = spark.createDataFrame(rows, "g string, k long, id long")
    got = exact_ntile(df, "g", ["k", "id"], 2).collect()
    want = _window_ntile(df, "g", ["k", "id"], 2).collect()
    assert sorted(map(lambda r: tuple("" if v is None else v for v in r), got)) == sorted(
        map(lambda r: tuple("" if v is None else v for v in r), want)
    )


def test_recompute_after_full_unpersist_is_bit_identical(spark):
    """Placement is a pure function of row values (frozen broadcast
    verdict table; straddle window keyed on (group, cell)), so evicting
    EVERY cached block between the statistics pass and the action must
    reproduce bit-identical buckets — the r8 reservoir-sampled design
    aborted with a RuntimeError here, which at 100 TB turns an expected
    executor loss into a failed job."""
    from detector_network_processor_spark.session import release_cached

    rows = [("a" if i % 3 else "b", (i * 48271) % 1009, i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, k long, id long")
    result = exact_ntile(df, "g", ["k", "id"], 4)
    first = sorted(map(tuple, result.collect()))
    release_cached(spark, blocking=True)  # force full recompute
    second = sorted(map(tuple, result.collect()))
    want = sorted(map(tuple, _window_ntile(df, "g", ["k", "id"], 4).collect()))
    assert first == second == want


def test_float_group_keys_rejected_loudly(spark):
    """Spark normalizes NaN group keys into one group, but the driver
    tallies the collected histogram in a Python dict where two NaN
    instances are DISTINCT keys (hash-by-id) — a genuine-NaN group value
    would silently split its group. Rejected loudly at plan build."""
    import pytest

    rows = [(1.5, 5, 0), (float("nan"), 9, 2), (None, 7, 5)]
    df = spark.createDataFrame(rows, "g double, k long, id long")
    with pytest.raises(TypeError, match="float/double group columns"):
        exact_ntile(df, "g", ["k", "id"], 2)


def test_heavy_ties_single_cell_matches_window_ntile(spark):
    """Every row of a group sharing ONE order value (one log-cell — the
    unsplittable-skew case) must still tile exactly: the cell histogram
    degrades to a single fat bucket and ranks come from the tiebreaker
    order, bit-identical to the window ntile."""
    rows = [("a", 7, i) for i in range(100)] + [("b", 7, 100 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, k long, id long")
    got = exact_ntile(df, "g", ["k", "id"], 4).collect()
    want = _window_ntile(df, "g", ["k", "id"], 4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_null_and_negative_order_values_match_window_ntile(spark):
    """Null order keys sort FIRST (bucket from the low end), negatives
    exercise the sign-split arm of the monotone cell map."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(300):
        k = None if i % 17 == 0 else rng.uniform(-1e6, 1e6)
        rows.append(("g1" if i % 3 else "g2", k, i))
    df = spark.createDataFrame(rows, "g string, k double, id long")
    got = exact_ntile(df, "g", ["k", "id"], 3).collect()
    want = _window_ntile(df, "g", ["k", "id"], 3).collect()

    def norm(r):
        return tuple("" if v is None else str(v) for v in r)

    assert sorted(map(norm, got)) == sorted(map(norm, want))


def test_timestamp_order_column_matches_window_ntile(spark):
    """Timestamp order keys are range-split via the monotone double cast."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("s", base + datetime.timedelta(seconds=(i * 48271) % 1009), i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, t timestamp, id long")
    got = exact_ntile(df, "g", ["t", "id"], 5).collect()
    want = _window_ntile(df, "g", ["t", "id"], 5).collect()
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


def test_ccnet_approx_registered_plan_is_pure_jvm_no_window(spark):
    """The registered scale path (ccnet_ppl_buckets_approx) must contain
    neither a Window operator nor a Python stage: thresholds come from one
    approx_percentile aggregate, assignment is a broadcast join + CASE."""
    from detector_network_processor_spark.plans import all_queries

    df = all_queries()["ccnet_ppl_buckets_approx"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    spark.catalog.clearCache()


def test_converged_graph_oracles_pin_materialized_edges():
    """The converged-graph oracles are recursive CTEs over the expensive
    pair-histogram subquery; DuckDB INLINES non-recursive CTEs referenced
    from a recursive term, so without AS MATERIALIZED the histogram
    re-evaluates on every iteration (measured: hours instead of one-shot
    cost at sf0.1). Pin the hint so an oracle edit can't silently
    reintroduce that."""
    from detector_network_processor_spark.plans import all_queries

    qs = all_queries()
    for name in ("station_communities_converged", "station_pagerank_converged"):
        oracle = qs[name].oracle
        assert oracle.count("AS MATERIALIZED") >= 2, name


def test_ccnet_registered_plan_has_no_sort_window(spark):
    """The registered exact mode must contain NO per-language sort: no
    MapInPandas / Python stage anywhere (the r10 redesign assigns
    buckets via a broadcast verdict join, map-only for non-straddling
    cells), and any Window in the plan partitions by (lang, CELL) — the
    straddle branch — never by the group alone, so no language ever
    serializes through one task. The final orderBy(doc_id) is a range
    sort, not a Window."""
    import re

    from detector_network_processor_spark.plans import all_queries

    df = all_queries()["ccnet_ppl_buckets"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan
    for m in re.finditer(r"Window \[row_number", plan):
        tail = plan[m.start() : m.start() + 300]
        assert "_cell" in tail, tail
    spark.catalog.clearCache()


def test_date_order_column_matches_window_ntile(spark):
    """Spark 4.x rejects CAST(date AS DOUBLE); the monotone cell map must
    route dates through unix_date instead of failing at the histogram
    pass (r9 ADVICE)."""
    import datetime

    base = datetime.date(2020, 1, 1)
    rows = [
        ("s" if i % 4 else "t", base + datetime.timedelta(days=(i * 48271) % 1009), i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, d date, id long")
    got = exact_ntile(df, "g", ["d", "id"], 5).collect()
    want = _window_ntile(df, "g", ["d", "id"], 5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_timestamp_ntz_order_column_matches_window_ntile(spark):
    """Spark 4.x rejects CAST(timestamp_ntz AS DOUBLE); the cell map must
    use timezone-free epoch arithmetic, keeping sub-second resolution
    (r9 ADVICE). Sub-day + sub-second deltas exercise the time-of-day
    terms, pre-1970 dates the negative-days arm."""
    import datetime

    base = datetime.datetime(1969, 12, 25)
    rows = [
        (
            "s",
            base
            + datetime.timedelta(
                seconds=(i * 48271) % 100_000, microseconds=(i * 7919) % 1_000_000
            ),
            i,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, t timestamp_ntz, id long")
    assert dict(df.dtypes)["t"] == "timestamp_ntz"
    got = exact_ntile(df, "g", ["t", "id"], 5).collect()
    want = _window_ntile(df, "g", ["t", "id"], 5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_histogram_cap_fails_loudly(spark, monkeypatch):
    """A pathological groups x cells product must raise a diagnosable
    error before materializing an unbounded driver list (r9 verdict #3).
    The cap is monkeypatched small; real domains stay far below 4M."""
    import pytest

    from detector_network_processor_spark.operators import rank as rank_mod

    rows = [(f"g{i % 40}", float(i), i) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, k double, id long")
    monkeypatch.setattr(rank_mod, "_HIST_CAP", 50)
    with pytest.raises(RuntimeError, match="histogram exceeds"):
        exact_ntile(df, "g", ["k", "id"], 3)


def test_map_only_assignment_no_full_shuffle(spark):
    """The 100 TB property of the r10 redesign: bucket assignment for
    non-straddling cells is a broadcast join — the labeled branch has NO
    exchange of the data, no MapInPandas, no per-group Window. Any
    window in the plan partitions by (group, CELL), so a group never
    serializes through one task."""
    import re

    rows = [("a" if i % 3 else "b", (i * 48271) % 1009, i) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, k long, id long")
    plan = (
        exact_ntile(df, "g", ["k", "id"], 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    for m in re.finditer(r"Window \[row_number", plan):
        tail = plan[m.start() : m.start() + 300]
        assert "_cell" in tail, tail


def test_straddle_branch_exercised_and_exact(spark):
    """Force straddling: many rows sharing few cells, so every tile
    boundary falls INSIDE a cell — the windowed straddle branch must
    produce the exact window-ntile result (and the plan must contain the
    cell-keyed Window)."""
    rows = [("a", 7, i) for i in range(100)] + [("a", 9, 100 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, k long, id long")
    res = exact_ntile(df, "g", ["k", "id"], 4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan  # straddle branch present
    got = res.collect()
    want = _window_ntile(df, "g", ["k", "id"], 4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_nondeterministic_input_fails_loudly_end_to_end(spark, tmp_path):
    """A row surfacing in a (group, cell) the statistics pass never saw
    must raise inside the plan (raise_error guard), not silently
    mis-bucket: simulated by overwriting the source parquet between the
    statistics pass (inside exact_ntile) and the action."""
    import pytest

    src = str(tmp_path / "nd_src")
    rows = [("a", (i * 48271) % 1009, i) for i in range(200)]
    spark.createDataFrame(rows, "g string, k long, id long").write.mode(
        "overwrite"
    ).parquet(src)
    df = spark.read.parquet(src)
    result = exact_ntile(df, "g", ["k", "id"], 3)  # stats pass reads v1
    # rewrite with rows in cells v1 never had (huge new key magnitudes)
    rows2 = [("a", 10**12 + i, i) for i in range(200)]
    spark.createDataFrame(rows2, "g string, k long, id long").write.mode(
        "overwrite"
    ).parquet(src)
    with pytest.raises(Exception, match="not deterministic between passes"):
        result.collect()


def test_property_exact_ntile_matches_window_on_adversarial_inputs(spark):
    """Hypothesis sweep of the r10 map-only design against the window
    ntile: mixed-magnitude doubles (subnormals, 1e308, +-inf, NaN),
    nulls, heavy ties, null group keys, 1..6 buckets. Few examples (each
    costs Spark jobs), maximal value diversity per example."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    POOL = [
        None,
        float("nan"),
        float("inf"),
        float("-inf"),
        0.0,
        -0.0,
        5e-324,
        -5e-324,
        1e308,
        -1e308,
        1.0,
        1.0,
        1.0,  # repeated: tie mass
        -7.5,
        3.25,
        1e-12,
        256.0,
        257.0,
    ]

    def norm(rows):
        out = []
        for r in rows:
            t = tuple(
                "nan"
                if isinstance(v, float) and math.isnan(v)
                else ("0.0" if isinstance(v, float) and v == 0.0 else str(v))
                for v in r
            )
            out.append(t)
        return sorted(out)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        keys=st.lists(st.sampled_from(POOL), min_size=1, max_size=60),
        groups=st.lists(st.sampled_from(["a", "b", None]), min_size=1, max_size=60),
        b=st.integers(min_value=1, max_value=6),
    )
    def check(keys, groups, b):
        rows = [
            (groups[i % len(groups)], keys[i % len(keys)], i)
            for i in range(max(len(keys), len(groups)))
        ]
        df = spark.createDataFrame(rows, "g string, k double, id long")
        got = exact_ntile(df, "g", ["k", "id"], b).collect()
        want = _window_ntile(df, "g", ["k", "id"], b).collect()
        assert norm(got) == norm(want)

    check()


def test_reserved_internal_names_rejected_loudly(spark):
    """Input columns colliding with the operator's bookkeeping names (or a
    bucket_col that already exists) must fail at plan build with a clear
    message, not surface as an ambiguous-reference analysis error deep in
    the broadcast-join select (r10 ADVICE)."""
    import pytest

    df = spark.createDataFrame([("a", 1, 0)], "g string, k long, _cell long")
    with pytest.raises(ValueError, match="internal bookkeeping names"):
        exact_ntile(df, "g", ["k"], 2)

    df2 = spark.createDataFrame([("a", 1, "x")], "g string, k long, bucket string")
    with pytest.raises(ValueError, match="already exists"):
        exact_ntile(df2, "g", ["k"], 2)


def _four_interior_cells():
    """100 rows, keys 1/2/4/8 (4 distinct log-cells) x 25 rows, 4 buckets:
    every cell's rank range lies exactly inside one bucket — pure map-only
    branch, no straddle."""
    return [
        ("a", k, j * 25 + i)
        for j, k in enumerate((1, 2, 4, 8))
        for i in range(25)
    ]


def test_default_mode_cannot_detect_vanishing_rows(spark, tmp_path):
    """The documented blind spot, pinned: rows vanishing from an
    already-labeled cell between the statistics pass and the action are
    silently absent from the output with every surviving row keeping its
    FROZEN label — no guard can trip (exact ranks of a moving target are
    unknowable without a second pass). verify_counts=True exists for
    exactly this (next test)."""
    src = str(tmp_path / "van_src")
    rows = _four_interior_cells()
    spark.createDataFrame(rows, "g string, k long, id long").write.mode(
        "overwrite"
    ).parquet(src)
    df = spark.read.parquet(src)
    result = exact_ntile(df, "g", ["k", "id"], 4)  # stats pass reads v1
    # v2: the whole k==2 cell vanishes (cells/keys otherwise unchanged)
    spark.createDataFrame(
        [r for r in rows if r[1] != 2], "g string, k long, id long"
    ).write.mode("overwrite").parquet(src)
    got = result.collect()  # no raise: silently short, frozen labels
    assert len(got) == 75
    assert {r["bucket"] for r in got} == {"1", "3", "4"}


def test_verify_counts_raises_on_any_cell_drift(spark, tmp_path):
    """verify_counts=True (adjudication mode) re-runs the counting pass
    and must raise on ANY per-(group, cell) drift — including rows
    vanishing from (or added to) an interior cell, the channel the
    in-plan guards cannot see. Drift is induced by a pass-counting Arrow
    filter: pass 1 (statistics) keeps every row, pass 2 (verify) drops
    the k==2 cell."""
    import pytest

    flag = str(tmp_path / "pass_counter")

    @F.pandas_udf("boolean")
    def keep(k: pd.Series) -> pd.Series:
        import os

        n = 0
        if os.path.exists(flag):
            with open(flag) as f:
                n = int(f.read() or 0)
        with open(flag, "w") as f:
            f.write(str(n + 1))
        if n == 0:
            return pd.Series([True] * len(k))
        return k != 2

    keep = keep.asNondeterministic()
    df = (
        spark.createDataFrame(_four_interior_cells(), "g string, k long, id long")
        .coalesce(1)  # one task per pass -> the counter sees each scan once
        .filter(keep(F.col("k")))
    )
    with pytest.raises(RuntimeError, match="counts drifted between two"):
        # pin_input=False: a persisted input would (correctly) make the
        # verify pass read the cache and see no drift
        exact_ntile(df, "g", ["k", "id"], 4, pin_input=False, verify_counts=True)


def test_verify_counts_passes_on_deterministic_input(spark):
    """verify_counts must be a no-op on deterministic inputs: same plan,
    same buckets, bit-identical to the window ntile."""
    rows = [("a" if i % 3 else "b", (i * 48271) % 1009, i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, k long, id long")
    got = exact_ntile(df, "g", ["k", "id"], 3, verify_counts=True).collect()
    want = _window_ntile(df, "g", ["k", "id"], 3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_reserved_name_guard_is_case_insensitive(spark):
    """Spark's analyzer resolves names case-insensitively by default, so
    '_Cell' and a case-variant bucket_col collide just as surely as the
    exact spellings — the guards must catch them."""
    import pytest

    df = spark.createDataFrame([("a", 1, 0)], "g string, k long, _Cell long")
    with pytest.raises(ValueError, match="internal bookkeeping names"):
        exact_ntile(df, "g", ["k"], 2)

    df2 = spark.createDataFrame([("a", 1, "x")], "g string, k long, Bucket string")
    with pytest.raises(ValueError, match="already exists"):
        exact_ntile(df2, "g", ["k"], 2)


def test_verify_counts_ignores_pin_and_sees_the_source(spark, tmp_path):
    """verify_counts must read the input UNPINNED even when the caller
    leaves pin_input=True (the default): Spark's cache is plan-keyed, so
    a persisted input would serve the verify pass the first pass's own
    blocks and drift could never be observed."""
    import pytest

    flag = str(tmp_path / "pass_counter2")

    @F.pandas_udf("boolean")
    def keep(k: pd.Series) -> pd.Series:
        import os

        n = 0
        if os.path.exists(flag):
            with open(flag) as f:
                n = int(f.read() or 0)
        with open(flag, "w") as f:
            f.write(str(n + 1))
        if n == 0:
            return pd.Series([True] * len(k))
        return k != 2

    keep = keep.asNondeterministic()
    df = (
        spark.createDataFrame(_four_interior_cells(), "g string, k long, id long")
        .coalesce(1)
        .filter(keep(F.col("k")))
    )
    with pytest.raises(RuntimeError, match="counts drifted between two"):
        exact_ntile(df, "g", ["k", "id"], 4, verify_counts=True)  # pin_input default True


def test_verify_counts_warns_when_pin_request_dropped(spark):
    """verify_counts=True silently overrode an explicit pin_input=True —
    the unpinned read is necessary (a pinned input would verify itself
    from its own cache blocks) but the caller got no signal their pin was
    ignored nor that the input recomputes per pass (r11 ADVICE #4). Only
    an EXPLICIT pin_input=True warns: the default (None) caller never
    requested a pin, so there is nothing to tell them was ignored."""
    import warnings

    import pytest

    df = spark.createDataFrame(
        [("a", i % 7, i) for i in range(50)], "g string, k long, id long"
    )
    with pytest.warns(UserWarning, match="ignores pin_input=True"):
        exact_ntile(df, "g", ["k", "id"], 2, pin_input=True, verify_counts=True).count()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        exact_ntile(df, "g", ["k", "id"], 2, pin_input=False, verify_counts=True).count()
        exact_ntile(df, "g", ["k", "id"], 2, verify_counts=True).count()  # default
