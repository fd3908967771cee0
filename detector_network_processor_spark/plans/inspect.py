"""Physical-plan fingerprinting: the quantitative form of the
"one full-data shuffle per operator" audit in SCALING.md.

A fingerprint is the count of scale-relevant physical operators in a
query's executed plan — shuffle exchanges, broadcast exchanges, cartesian
products, parquet scans. Plan SHAPE is data-size-independent, so a
fingerprint computed at the smallest fixture SF pins the shuffle story for
every SF: a future edit that silently adds an exchange (or turns a
broadcast join into a shuffle join, or introduces a cartesian product)
changes the fingerprint and fails the regression test.

Used by bench.py (per-round plan_exchanges evidence), by
tools/plan_fingerprints.py (regenerates the committed PLAN_FINGERPRINTS.json
snapshot), and by tests/test_plan_fingerprints.py (the regression gate).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Exchange subtypes that move data between tasks. BroadcastExchange is
# counted separately — a broadcast is the CHEAP side of a join decision and
# regressing broadcast->shuffle shows up as a shuffle-count increase.
_SHUFFLE_RE = re.compile(r"\bExchange (?:hash|range|Single|RoundRobin)")
_PLAN_ID_RE = re.compile(r"\[plan_id=(\d+)\]")


def _count_unique(plan: str, node_re: re.Pattern[str]) -> int:
    """Count DISTINCT physical nodes matching ``node_re``: plan text
    reprints a cached subtree under every InMemoryRelation that references
    it, so a raw substring count over a plan with persisted intermediates
    double-counts the same Exchange (same ``plan_id``) once per reprint —
    the r9 ccnet fingerprint read 19 shuffles for a plan that executes 6.
    Nodes printed without a plan_id tag are counted per occurrence (the
    pre-r9 behavior), so this can only remove double-counting."""
    seen: set[str] = set()
    untagged = 0
    for line in plan.splitlines():
        if not node_re.search(line):
            continue
        m = _PLAN_ID_RE.search(line)
        if m:
            seen.add(m.group(1))
        else:
            untagged += 1
    return len(seen) + untagged


def plan_fingerprint(df: DataFrame) -> dict[str, int | bool]:
    """Count scale-relevant operators in ``df``'s executed plan.

    Keys: ``shuffle`` (inter-task exchanges), ``broadcast``
    (BroadcastExchange), ``cartesian`` (CartesianProduct — should be 0
    everywhere except deliberate small-dimension grids), ``scans``
    (columnar parquet scans). ``truncated: true`` is added when the plan
    contains ``Scan ExistingRDD`` — an eager localCheckpoint hides the
    upstream stages, so counts are partial and a consumer must not read
    them as the full shuffle story.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    fp: dict[str, int | bool] = {
        "shuffle": _count_unique(plan, _SHUFFLE_RE),
        "broadcast": _count_unique(plan, re.compile(r"BroadcastExchange")),
        "cartesian": plan.count("CartesianProduct"),
        "scans": len(re.findall(r"Scan parquet", plan)),
        # row-at-a-time Python UDF stages — the 10-100x-slower-than-Arrow
        # path; pinned to ZERO registry-wide by test_plan_fingerprints
        "python_row": plan.count("BatchEvalPython"),
        # Arrow-batched Python stages (pandas_udf / mapInPandas /
        # applyInPandas) — the sanctioned Python escape hatch; counted so
        # a plan quietly growing a new Python stage is visible
        "python_arrow": sum(
            plan.count(op)
            for op in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ),
    }
    if "Scan ExistingRDD" in plan:
        fp["truncated"] = True
    return fp
