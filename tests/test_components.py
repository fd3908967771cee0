"""Connected-components operator (operators/components.py): handcrafted
graphs + randomized equivalence against a Python union-find golden model."""

from __future__ import annotations

import random

import pytest

from detector_network_processor_spark.operators.components import connected_components


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {int(r["node"]): int(r["component"]) for r in out.collect()}


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_chain_collapses_to_min(spark):
    got = _run(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components(spark):
    got = _run(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_and_duplicate_reversed_edges(spark):
    got = _run(spark, [(7, 1), (1, 7), (8, 1), (9, 1), (9, 1)])
    assert got == {1: 1, 7: 1, 8: 1, 9: 1}


def test_self_loops_ignored(spark):
    got = _run(spark, [(3, 3), (3, 2)])
    assert got == {2: 2, 3: 2}


def test_randomized_vs_union_find(spark):
    rng = random.Random(4242)
    nodes = list(range(1, 120))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    assert got == _union_find(edges)


def test_components_observe_signature(spark):
    """r13: the contraction loop folds its convergence signature into the
    checkpoint job via ``observe`` (_ckpt_with_signature). Pins (a) the
    observed signature is IDENTICAL to the standalone ``_signature``
    aggregate over the checkpointed rows, and (b) the fold costs ZERO extra
    jobs — one contraction round's checkpoint action launches the same job
    count with the observe node as without it, while the standalone
    signature the fold replaces costs at least one more (AQE may split a
    single action into several jobs, so the pin is a delta, not '== 1')."""
    import pyspark.sql.functions as F

    from detector_network_processor_spark.operators.components import (
        _ckpt_with_signature,
        _large_star,
        _orient,
        _signature,
        _small_star,
    )
    from detector_network_processor_spark.session import eager_ckpt_tracked, release_ckpts

    rng = random.Random(99)
    nodes = list(range(1, 200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(260)]
    df = spark.createDataFrame([(a, b) for a, b in edges if a != b], "src long, dst long")
    e, e_h, sig = _ckpt_with_signature(
        _orient(df.select(F.col("src").alias("a"), F.col("dst").alias("b")))
    )
    assert sig == _signature(e)

    tracker = spark.sparkContext.statusTracker()

    def jobs_in(group, fn):
        spark.sparkContext.setJobGroup(group, group)
        try:
            out = fn()
        finally:
            spark.sparkContext.setJobGroup(None, None)
        return out, len(tracker.getJobIdsForGroup(group))

    (nxt_obs, h_obs, nsig), n_obs = jobs_in(
        "obs-fold-round", lambda: _ckpt_with_signature(_small_star(_large_star(e)))
    )
    (nxt_plain, h_plain), n_plain = jobs_in(
        "plain-ckpt-round", lambda: eager_ckpt_tracked(_small_star(_large_star(e)))
    )
    sig_plain, n_sig = jobs_in("standalone-sig", lambda: _signature(nxt_plain))

    assert nsig == _signature(nxt_obs) == sig_plain
    assert n_obs == n_plain, f"observe fold added jobs: {n_obs} vs {n_plain}"
    assert n_sig >= 1  # the job the fold removes from every round
    release_ckpts(e_h)
    release_ckpts(h_obs)
    release_ckpts(h_plain)


def test_window_stars_match_join_reference_per_round(spark):
    """The r12 window-form stars must reproduce the join-based reference
    ROUND BY ROUND (edge-set equality, not just final components): large
    star without its old inter-star distinct feeding the single-pass small
    star is the same set transformation as groupBy-min + join-back +
    distinct."""
    import pyspark.sql.functions as F

    from detector_network_processor_spark.operators.components import (
        _large_star,
        _orient,
        _small_star,
    )

    def ref_large_star(edges):
        sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def ref_small_star(edges):
        mins = edges.groupBy("a").agg(F.min("b").alias("m"))
        j = edges.join(mins, "a")
        leaf = j.filter(F.col("b") != F.col("m")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        root = mins.select(F.col("a"), F.col("m").alias("b"))
        return leaf.union(root).filter(F.col("a") != F.col("b")).distinct()

    def edge_set(df):
        return {(int(r["a"]), int(r["b"])) for r in df.collect()}

    rng = random.Random(20260818)
    for trial in range(3):
        nodes = list(range(1, 80))
        raw = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(110)]
        df = spark.createDataFrame(raw, "src long, dst long")
        e_new = _orient(
            df.select(F.col("src").cast("long").alias("a"), F.col("dst").cast("long").alias("b"))
        ).localCheckpoint(eager=True)
        e_ref = e_new
        for _round in range(4):
            # the new large star carries duplicates by design; the composed
            # round output (post small-star distinct) must match the
            # reference round exactly, and the large-star SETS must agree
            assert edge_set(_large_star(e_new).distinct()) == edge_set(ref_large_star(e_ref))
            e_new = _small_star(_large_star(e_new)).localCheckpoint(eager=True)
            e_ref = ref_small_star(ref_large_star(e_ref)).localCheckpoint(eager=True)
            assert edge_set(e_new) == edge_set(e_ref), f"trial {trial} round {_round}"


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(5, 4), (4, 3), (3, 2), (2, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=0)
