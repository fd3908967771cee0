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
        "shuffle": len(_SHUFFLE_RE.findall(plan)),
        "broadcast": plan.count("BroadcastExchange"),
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
