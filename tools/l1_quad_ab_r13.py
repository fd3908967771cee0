#!/usr/bin/env python
"""r13 receipt for the n=4 closed-form JVM tier (VERDICT r12 #4).

Measures, for l1_coincidence at sf0.1 and at Kx events:

- the session-size distribution and the Arrow-stage row count before/after
  (n>3 vs n>4 routing) — the "python_arrow handles strictly fewer rows"
  evidence;
- xor-hash identity of the full query output under both routings;
- interleaved wall A/B (noop sink), _SMALL_MAX_N = 3 (r12 routing) vs 4.

Usage: python tools/l1_quad_ab_r13.py [K] [reps]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from detector_network_processor_spark.constants import MAX_TIME_NS  # noqa: E402
from detector_network_processor_spark.operators import coincidence  # noqa: E402
from detector_network_processor_spark.operators.sessionize import sessionize_global_gap  # noqa: E402
from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.plans.muon import muonize_events  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402
from scale_bench import build_scaled  # noqa: E402


def session_tail(spark, sf_dir) -> dict:
    ev = muonize_events(spark, sf_dir).select(F.col("start").cast("long"))
    sess = sessionize_global_gap(ev, "start", int(math.ceil(MAX_TIME_NS)))
    dist = (
        sess.groupBy("session_n")
        .agg((F.count(F.lit(1)) / F.col("session_n")).cast("long").alias("sessions"))
        .orderBy("session_n")
        .collect()
    )
    out = {int(r["session_n"]): int(r["sessions"]) for r in dist}
    release_cached(spark)
    return out


def xor_hash(df) -> tuple[int, int]:
    cols = ", ".join(df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({cols}))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="l1-quad-ab-r13")
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = f"/tmp/dnp_scaled_x{k}_events"
    if not os.path.exists(os.path.join(scaled, "events.parquet")):
        build_scaled(spark, k, scaled, tables=("events",))
    fn = all_queries()["l1_coincidence"].fn

    report = {"k": k, "reps": reps}
    for tag, sf in (("1x", base), (f"{k}x", scaled)):
        tail = session_tail(spark, sf)
        arrow_rows_r12 = sum(n * c for n, c in tail.items() if n > 3)
        arrow_rows_r13 = sum(n * c for n, c in tail.items() if n > 4)
        sig = {}
        for max_n in (3, 4):
            coincidence._SMALL_MAX_N = max_n
            sig[max_n] = xor_hash(fn(spark, sf))
            release_cached(spark)
        assert sig[3] == sig[4], sig
        runs = {"r12_n3": [], "r13_n4": []}
        for i in range(reps):
            order = [("r13_n4", 4), ("r12_n3", 3)]
            if i % 2:
                order.reverse()
            for side, max_n in order:
                coincidence._SMALL_MAX_N = max_n
                release_cached(spark)
                spark.sparkContext.setJobDescription(f"l1/{tag}/{side}/{i}")
                t = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                runs[side].append(round(time.time() - t, 3))
                spark.sparkContext.setJobDescription(None)
        coincidence._SMALL_MAX_N = 4
        report[tag] = {
            "sessions_by_n_tail": {str(n): c for n, c in tail.items() if n >= 3},
            "arrow_rows_r12_gt3": arrow_rows_r12,
            "arrow_rows_r13_gt4": arrow_rows_r13,
            "xor": list(sig[4]),
            "runs": runs,
            "min": {s: min(r) for s, r in runs.items()},
            "pairwise_n4_wins": sum(
                1 for a, b in zip(runs["r13_n4"], runs["r12_n3"]) if a < b
            ),
        }
        print(f"# {tag}: {json.dumps(report[tag])}", flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
