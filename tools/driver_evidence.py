#!/usr/bin/env python3
"""Render the driver-adjudication history derived from CORRECTNESS_r*.json.

Usage: python tools/driver_evidence.py [--markdown]

Prints, per registered query: every driver round that sampled it with the
verdict, plus the rollup counts the round verdicts need (adjudicated-ever,
never-sampled, unresolved fails). COVERAGE.md's evidence section is
generated from this — never hand-maintained.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from detector_network_processor_spark.evidence import driver_history  # noqa: E402
from detector_network_processor_spark.plans import all_queries  # noqa: E402


def main() -> None:
    md = "--markdown" in sys.argv
    hist = driver_history()
    names = list(all_queries())
    never = [n for n in names if n not in hist]
    unresolved = [n for n in names if n in hist and not hist[n]["last_pass"]]
    green_ever = [n for n in names if n in hist and hist[n]["last_pass"]]

    if md:
        print("| query | driver rounds (verdict) | latest |")
        print("|---|---|---|")
    for n in names:
        h = hist.get(n)
        if h is None:
            row = (n, "—", "never sampled")
        else:
            verdicts = ", ".join(f"r{r}:{'PASS' if p else 'FAIL'}" for r, p in h["rounds"])
            row = (n, verdicts, "PASS" if h["last_pass"] else "FAIL")
        if md:
            print(f"| {row[0]} | {row[1]} | {row[2]} |")
        else:
            print(f"{row[0]:32s} {row[2]:14s} {row[1]}")

    print()
    print(
        f"registered={len(names)} driver-green-latest={len(green_ever)} "
        f"unresolved-fail={len(unresolved)} never-sampled={len(never)}"
    )
    if unresolved:
        print("unresolved:", ", ".join(unresolved))
    if never:
        print("never:", ", ".join(never))


if __name__ == "__main__":
    main()
