#!/usr/bin/env python
"""r13 interleaved A/B for the coincidence-increment overlapped terminal
writes (VERDICT r12 #5): streaming/incremental.py::process_increment now
submits its two independent writes (closed output, carried-state version)
from a thread pool (run_overlapped); the old form ran them sequentially.

Replays the sf0.1 muonized hit stream as 4 foreachBatch increments end to
end (writes + state versioning + prune), overlapped vs sequential, A/B
interleaved in one session. The sequential side monkeypatches
run_overlapped with in-order execution — every other byte of the dataflow
is identical, so the delta is pure scheduling. Output parity is asserted
per cycle (xor over the closed-output dataset, both sides).

Usage: python tools/increment_overlap_ab_r13.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from detector_network_processor_spark.plans.muon import muonize_events  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402
from detector_network_processor_spark.streaming import incremental  # noqa: E402

N_BATCHES = 4


def sequential_overlapped(spark, jobs):
    for fn in jobs.values():
        fn()


def replay(spark, batches, mode: str) -> tuple[float, tuple[int, int]]:
    real = incremental.run_overlapped
    if mode == "sequential":
        incremental.run_overlapped = sequential_overlapped
    tmp = tempfile.mkdtemp(prefix=f"dnp_incab_{mode}_")
    try:
        out_path, state_path = f"{tmp}/out", f"{tmp}/state"
        release_cached(spark)
        t = time.time()
        for bid, b in enumerate(batches):
            spark.sparkContext.setJobDescription(f"increment/{mode}/batch{bid}")
            incremental.process_increment(spark, b, state_path, out_path, batch_id=bid)
        incremental.flush_incremental_state(spark, state_path, out_path)
        wall = round(time.time() - t, 3)
        spark.sparkContext.setJobDescription(None)
        out = spark.read.parquet(out_path).filter(F.col("n") >= 2)
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(start, end, n, conflicting, true_e, "
                       "xxhash64(to_json(events))))"),
                F.lit(0),
            ).alias("h"),
        ).collect()[0]
        return wall, (int(row["n"]), int(row["h"]))
    finally:
        incremental.run_overlapped = real
        shutil.rmtree(tmp, ignore_errors=True)
        release_cached(spark)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="increment-overlap-ab-r13")

    hits = muonize_events(spark, sf).select(*incremental.HIT_COLS).orderBy("start")
    n = hits.count()
    per = (n + N_BATCHES - 1) // N_BATCHES
    rows = hits.collect()
    schema = hits.schema
    batches = [
        spark.createDataFrame(rows[i * per : (i + 1) * per], schema) for i in range(N_BATCHES)
    ]

    runs = {"overlapped": [], "sequential": []}
    sigs = set()
    for i in range(reps):
        order = ["overlapped", "sequential"]
        if i % 2:
            order.reverse()
        for mode in order:
            wall, sig = replay(spark, batches, mode)
            runs[mode].append(wall)
            sigs.add(sig)
            print(f"# {mode} run{i}: {wall}s sig={sig}", flush=True)
    assert len(sigs) == 1, f"output diverged across modes/runs: {sigs}"
    print(json.dumps({
        "sf": sf, "batches": N_BATCHES, "runs": runs,
        "min": {m: min(r) for m, r in runs.items()},
        "pairwise_overlap_wins": sum(
            1 for a, b in zip(runs["overlapped"], runs["sequential"]) if a < b
        ),
        "sig": list(next(iter(sigs))),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
