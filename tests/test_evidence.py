"""The registry's driver-facing order must be weakest-evidence-first —
the mechanism that rotates driver adjudication across all queries
(the driver samples a fixed-size PREFIX of queries())."""

from __future__ import annotations

from detector_network_processor_spark.evidence import driver_history, evidence_sort_key
from detector_network_processor_spark.plans import REGISTRY, all_queries


def test_prefix_is_weakest_evidence_first():
    names = list(all_queries())
    hist = driver_history()
    # Partition ranks must be non-decreasing along the dict order.
    def rank(n):
        h = hist.get(n)
        if h is None:
            return 1
        return 0 if not h["last_pass"] else 2

    ranks = [rank(n) for n in names]
    assert ranks == sorted(ranks), "registry order is not evidence-partitioned"
    # Every unresolved driver FAIL and never-sampled query precedes every
    # green one.
    first_green = ranks.index(2) if 2 in ranks else len(ranks)
    assert all(r != 2 for r in ranks[:first_green])


def test_sort_key_orders_fail_never_green():
    hist = {
        "green_old": {"rounds": [(1, True)], "last_round": 1, "last_pass": True},
        "green_new": {"rounds": [(4, True)], "last_round": 4, "last_pass": True},
        "failed": {"rounds": [(1, False)], "last_round": 1, "last_pass": False},
        "recovered": {
            "rounds": [(1, False), (3, True)],
            "last_round": 3,
            "last_pass": True,
        },
    }
    key = evidence_sort_key(hist)
    got = sorted(["green_new", "never", "green_old", "failed", "recovered"], key=key)
    assert got == ["failed", "never", "green_old", "recovered", "green_new"]


def test_registry_and_ordered_view_agree():
    assert set(all_queries()) == set(REGISTRY)
