"""The registry's driver-facing order must be weakest-evidence-first —
the mechanism that rotates driver adjudication across all queries
(the driver samples a fixed-size PREFIX of queries())."""

from __future__ import annotations

from detector_network_processor_spark.evidence import (
    _row_passed,
    driver_history,
    evidence_sort_key,
)
from detector_network_processor_spark.plans import (
    REGISTRY,
    all_queries,
    evidence_ordered_queries,
)


def test_prefix_is_weakest_evidence_first():
    names = list(evidence_ordered_queries())
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
    assert set(evidence_ordered_queries()) == set(REGISTRY)
    # all_queries() is the stable registration-order contract.
    assert list(all_queries()) == list(REGISTRY)


def test_row_with_no_verdict_keys_is_not_a_pass():
    # An artifact row carrying neither err nor any of the three check keys
    # is an unrecognized shape — must NOT classify as PASS (which would
    # rotate a possibly-failing query to the back of the queue).
    assert _row_passed({"rows": 12}) is False
    assert _row_passed({"err": "boom"}) is False
    assert _row_passed({"rows_match": True}) is True
    assert _row_passed({"rows_match": True, "hash_match": False}) is False
