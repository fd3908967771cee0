#!/usr/bin/env python
"""r13 interleaved A/B: observe-folded convergence signature vs the r12
standalone-signature-job form, on the full dedup_components(-_lsh) queries
at sf0.1 (noop sink, min-of-N, alternating order within each cycle).

The "old" side is reconstructed by monkeypatching
components._ckpt_with_signature back to the r12 two-job shape (plain
tracked checkpoint + a separate _signature aggregate) — the rest of the
operator is byte-identical, so the delta is exactly the folded job.

Usage: python tools/obsfold_ab_r13.py [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from detector_network_processor_spark.operators import components  # noqa: E402
from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.session import (  # noqa: E402
    eager_ckpt_tracked,
    get_spark,
    release_cached,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_ckpt_with_signature(df):
    ck, handles = eager_ckpt_tracked(df)
    return ck, handles, components._signature(ck)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    names = sys.argv[2:] or ["dedup_components", "dedup_components_lsh"]
    spark = get_spark(app_name="obsfold-ab-r13")
    specs = all_queries()
    new_fn = components._ckpt_with_signature

    def run(name: str) -> float:
        release_cached(spark)
        t = time.time()
        specs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        return round(time.time() - t, 3)

    out = {}
    for name in names:
        runs = {"new": [], "old": []}
        for i in range(reps):
            order = [("new", new_fn), ("old", old_ckpt_with_signature)]
            if i % 2:
                order.reverse()
            for side, fn in order:
                components._ckpt_with_signature = fn
                spark.sparkContext.setJobDescription(f"{name}/{side}/{i}")
                runs[side].append(run(name))
                spark.sparkContext.setJobDescription(None)
        components._ckpt_with_signature = new_fn
        out[name] = {
            **runs,
            "min_new": min(runs["new"]),
            "min_old": min(runs["old"]),
            "pairwise_new_wins": sum(1 for a, b in zip(runs["new"], runs["old"]) if a < b),
        }
        print(f"# {name}: new={runs['new']} old={runs['old']}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": SF, "reps": reps, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
