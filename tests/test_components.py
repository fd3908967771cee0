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


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(5, 4), (4, 3), (3, 2), (2, 1)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=0)
