#!/usr/bin/env python
"""Probe-gated quiet-window spot-check for the streaming throughput number
(r11 verdict next-round #5): run the window_sliding_stats probe first; only
when the window is in the quiet class (min-of-2 < $QUIET_GATE, default
0.23 s) run the 10x streaming sweep, bracketing it with the same probe so
the hits/s x probe linear host invariant (SCALING.md r11) can adjudicate
the reading either way. Appends one JSON line per attempt to
$STREAM_QUIET_LOG (default /tmp/stream_quiet_attempts.jsonl); a quiet-window
success also writes SCALE_RESULTS_LAST_streaming.json via the sweep's own
persistence.
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


def probe(spark, specs, sf_dir="/root/testdata/sf0.1") -> float:
    release_cached(spark, jvm_gc=True, settle_sec=0.2)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        specs["window_sliding_stats"].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    gate = float(os.environ.get("QUIET_GATE", "0.23"))
    log_path = os.environ.get("STREAM_QUIET_LOG", "/tmp/stream_quiet_attempts.jsonl")
    spark = get_spark(app_name="dnp-stream-quiet-check")
    specs = all_queries()
    # warm the probe plan once (codegen) before gating on it
    specs["window_sliding_stats"].fn(spark, "/root/testdata/sf0.001").count()
    p0 = probe(spark, specs)
    entry = {"ts": time.time(), "probe_before": p0, "gate": gate}
    if p0 >= gate:
        entry["fired"] = False
        print(json.dumps(entry))
    else:
        entry["fired"] = True
        from tools.scale_experiments import cmd_streaming

        res = cmd_streaming(10)
        entry["result"] = res
        entry["probe_after"] = probe(spark, specs)
        entry["invariant_product_before"] = round(res["rows_per_sec"] * p0, 1)
        entry["invariant_product_after"] = round(
            res["rows_per_sec"] * entry["probe_after"], 1
        )
        print(json.dumps(entry))
    with open(log_path, "a") as f:
        f.write(json.dumps(entry) + "\n")
    spark.stop()
    return 0 if entry["fired"] else 3


if __name__ == "__main__":
    sys.exit(main())
