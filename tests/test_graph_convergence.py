"""Convergence-terminated variants of the iterative graph operators
(production path; the registered 3-iteration unrolls stay the oracle
contract). The property under test: the loop terminates by FIXPOINT on the
fixture graph (not by hitting its safety cap), each iteration's convergence
check is an O(1)-row driver aggregate, and the fixpoint is genuine — the
break condition is "no label changed" / "max rank delta <= tol", i.e. one
further synchronous step would reproduce the same state by construction.
"""

from __future__ import annotations

from detector_network_processor_spark.plans.muon import (
    station_communities_converged,
    station_pagerank_converged,
)
from detector_network_processor_spark.plans import all_queries

from conftest import SF_DIR_SMALL as SMALL_SF_DIR


def test_lpa_converges_to_fixpoint(spark):
    out, iters = station_communities_converged(spark, SMALL_SF_DIR, max_iters=20)
    rows = out.collect()
    # terminated by convergence (changed == 0), not by the safety cap
    assert 1 <= iters < 20, iters
    # covers every station the registered variant covers
    reg = all_queries()["station_communities"].fn(spark, SMALL_SF_DIR).collect()
    assert {r["hash"] for r in rows} == {r["hash"] for r in reg}
    # labels are real node ids (LPA invariant) and sizes are consistent
    hashes = {r["hash"] for r in rows}
    by_lbl: dict[int, int] = {}
    for r in rows:
        assert r["community"] in hashes
        by_lbl[r["community"]] = by_lbl.get(r["community"], 0) + 1
    for r in rows:
        assert r["community_size"] == by_lbl[r["community"]]


def test_pagerank_converges_within_tolerance(spark):
    out, iters = station_pagerank_converged(
        spark, SMALL_SF_DIR, max_iters=50, tol12=1_000_000
    )
    rows = out.collect()
    assert 1 <= iters < 50, iters
    # rank mass stays ~1 in the 1e12 fixed-point scale: floored per-edge
    # contributions only ever LOSE mass, bounded by (#edges + #nodes) ulps
    total = sum(r["rank12"] for r in rows)
    assert 0.95 * 10**12 <= total <= 10**12 + len(rows)
    # converged ranks separate hubs from leaves (not still the uniform init)
    assert len({r["rank12"] for r in rows}) > 1
