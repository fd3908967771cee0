"""Shuffle-discipline regression gate: every registered query's physical
plan must match the committed fingerprint (PLAN_FINGERPRINTS.json —
shuffle / broadcast / cartesian / scan counts at the smallest fixture SF).

A future edit that adds an exchange to a plan, turns a broadcast join into
a shuffle join, or introduces a cartesian product fails HERE with the
before/after counts, instead of shipping silently and surfacing as a
100x-scale wall regression. Deliberate plan changes regenerate the
snapshot: ``python tools/plan_fingerprints.py [names...]``.

Plan SHAPE is data-size-independent (AQE re-plans sizes at runtime but the
static operator counts come from the initial plan), so fingerprints pinned
at sf0.001 guard every SF.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from detector_network_processor_spark.plans import all_queries
from detector_network_processor_spark.plans.inspect import plan_fingerprint

from conftest import SF_DIR_SMALL

SNAPSHOT = Path(__file__).resolve().parents[1] / "PLAN_FINGERPRINTS.json"


from detector_network_processor_spark.session import release_cached as _release_cached


def test_all_plans_match_committed_fingerprints(spark):
    snapshot = json.loads(SNAPSHOT.read_text())
    specs = all_queries()

    missing = sorted(set(specs) - set(snapshot))
    assert not missing, (
        f"queries with no committed fingerprint (run tools/plan_fingerprints.py "
        f"{' '.join(missing)}): {missing}"
    )
    stale = sorted(set(snapshot) - set(specs))
    assert not stale, (
        "committed fingerprints for queries no longer in the registry — they "
        "would silently keep feeding the cartesian/python_row gates; "
        f"regenerate the snapshot (python tools/plan_fingerprints.py): {stale}"
    )

    diffs: list[str] = []
    for i, (name, spec) in enumerate(sorted(specs.items())):
        want = snapshot[name]
        if "error" in want:  # pragma: no cover — snapshot must be clean
            pytest.fail(f"committed fingerprint for {name} records a build error: {want}")
        got = plan_fingerprint(spec.fn(spark, SF_DIR_SMALL))
        if got != want:
            diffs.append(f"{name}: committed={want} current={got}")
        if (i + 1) % 20 == 0:
            _release_cached(spark)
    _release_cached(spark)

    assert not diffs, (
        "physical-plan fingerprints changed — re-audit the shuffle story, then "
        "regenerate deliberately with tools/plan_fingerprints.py:\n" + "\n".join(diffs)
    )


def test_no_cartesian_products_anywhere():
    """No registered plan may contain a CartesianProduct: the fixture's
    deliberate small-grid cross joins are expressed as broadcast
    nested-loop joins (bounded side broadcast), never a cartesian
    shuffle — at 100 TB a cartesian on a fact table is always a bug."""
    snapshot = json.loads(SNAPSHOT.read_text())
    offenders = {n: fp for n, fp in snapshot.items() if fp.get("cartesian", 0)}
    assert not offenders, f"cartesian products in committed plans: {offenders}"


def test_no_row_at_a_time_python_anywhere():
    """No registered plan may contain BatchEvalPython: every Python stage
    in the engine is Arrow-batched (pandas_udf / mapInPandas /
    applyInPandas — visible as python_arrow in the fingerprints). A
    row-at-a-time UDF sneaking into a hot path is a 10-100x regression at
    scale; pin it to zero across the whole registry."""
    snapshot = json.loads(SNAPSHOT.read_text())
    offenders = {n: fp for n, fp in snapshot.items() if fp.get("python_row", 0)}
    assert not offenders, f"row-at-a-time Python UDF stages in committed plans: {offenders}"
