#!/usr/bin/env python
"""Regenerate PLAN_FINGERPRINTS.json: the committed physical-plan
fingerprint (shuffle/broadcast/cartesian/scan counts) for EVERY registered
query, built at the smallest fixture SF.

This is the shuffle-discipline regression baseline: a code change that adds
an exchange to any of the 155 registered plans — or silently turns a
broadcast join into a shuffle join, or introduces a cartesian product —
changes this file, and tests/test_plan_fingerprints.py fails until the
change is re-audited and the snapshot deliberately regenerated here.

Usage: python tools/plan_fingerprints.py [--sf-dir DIR] [names...]
(default: all registered queries at /root/testdata/sf0.001; with names,
patches only those entries into the existing snapshot).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.plans.inspect import composed_fingerprint  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402

OUT = REPO / "PLAN_FINGERPRINTS.json"


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    specs = all_queries()
    names = args or sorted(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    snapshot: dict[str, dict] = {}
    if args and OUT.exists():  # partial regeneration patches the snapshot
        snapshot = json.loads(OUT.read_text())

    spark = get_spark(app_name="dnp-plan-fingerprints")
    try:
        for i, name in enumerate(names):
            try:
                # composed across checkpoint boundaries (r10 verdict #1):
                # checkpointed segments are fingerprinted at their
                # materialization points and summed with the final plan, so
                # the python_row=0 / shuffle pins cover the WHOLE execution
                snapshot[name] = composed_fingerprint(
                    lambda name=name: specs[name].fn(spark, sf_dir)
                )
            except Exception as e:
                print(f"# {name}: FAILED to build plan: {e}", file=sys.stderr)
                snapshot[name] = {"error": str(e)[:200]}
            if (i + 1) % 20 == 0:
                # some plan builds eagerly localCheckpoint (near_dup_jaccard
                # family); drop cached blocks so 155 builds don't accumulate
                release_cached(spark)
                print(f"# {i + 1}/{len(names)}", file=sys.stderr)
    finally:
        spark.stop()

    OUT.write_text(json.dumps(dict(sorted(snapshot.items())), indent=1) + "\n")
    n_err = sum(1 for v in snapshot.values() if "error" in v)
    print(f"wrote {OUT.name}: {len(snapshot)} fingerprints, {n_err} errors")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
