#!/usr/bin/env python
"""Measure Spark vs DuckDB-oracle wall time for a set of registered
queries at a given SF (default sf0.1) — the per-query oracle-ratio rows
BASELINE.md tracks per round.

Usage: python tools/oracle_ratios.py [--sf-dir DIR] [names...]

Protocol matches bench.py: JVM/codegen warmup pass at sf0.001, then
min-of-3 at the target SF with cache release between runs (this host shows
~±0.7 s hypervisor-noise spread on 2-3 s walls — min-of-2 lands on a noisy
pair often enough to misread a ratio); DuckDB runs the registered oracle
SQL on the same parquet (32 threads), min-of-3 after its own warm run.
Output: one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402
from detector_network_processor_spark.testing import duckdb_connect  # noqa: E402

DEFAULT = [
    "station_pagerank",
    "stations_within_range",
    "pair_rate_histogram",
    "user_sessions",
    "event_transitions",
    "token_pmi",
    "neardup_incremental_replay",
]


def _release_cached(spark) -> None:
    # same per-query isolation protocol as bench.py
    release_cached(spark, jvm_gc=True, settle_sec=0.2)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args or DEFAULT

    qs = all_queries()
    spark = get_spark(app_name="dnp-oracle-ratios")
    con = duckdb_connect(sf_dir)

    for name in names:
        spec = qs[name]
        # warmup (JIT/codegen) at the small SF
        spec.fn(spark, "/root/testdata/sf0.001").count()
        _release_cached(spark)
        sw = []
        for _ in range(3):
            t0 = time.monotonic()
            n = spec.fn(spark, sf_dir).count()
            sw.append(time.monotonic() - t0)
            _release_cached(spark)
        dw = None
        if spec.oracle is not None:
            con.execute(spec.oracle)  # warm
            dd = []
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(spec.oracle).fetchall()
                dd.append(time.monotonic() - t0)
            dw = min(dd)
        rec = {
            "query": name,
            "sf_dir": sf_dir,
            "spark_s": round(min(sw), 3),
            "spark_runs": [round(x, 3) for x in sw],
            "duckdb_s": round(dw, 3) if dw is not None else None,
            "ratio": round(min(sw) / dw, 3) if dw else None,
            "rows": n,
        }
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
