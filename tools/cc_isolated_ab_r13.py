#!/usr/bin/env python
"""r13: isolated connected-components A/B at scale (VERDICT r12 #2, stars).

The full dedup_components query at 100x documents is spill-regime noisy
(run spread 23-168 s both sides — receipt in scale_receipts.json), so the
star-form comparison is adjudicated on the ISOLATED CC stage: the near-dup
pair list of the Kx salted corpus is materialized to parquet ONCE, then
window-form (r12+r13 observe fold) vs join-form (r11) connected_components
runs interleaved over that fixed edge table. Wall + completed-stage byte
deltas (UI REST, retention raised) + per-run output xor identity.

Usage: python tools/cc_isolated_ab_r13.py [docs_k] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from detector_network_processor_spark.io import load_table  # noqa: E402
from detector_network_processor_spark.operators import components  # noqa: E402
from detector_network_processor_spark.operators.dedup import minhash_lsh_pairs  # noqa: E402
from detector_network_processor_spark.session import release_cached  # noqa: E402
from scale_bench import build_scaled  # noqa: E402
from tools.band_ab_r13 import get_spark_ui, shuffle_totals  # noqa: E402
from tools.skew_receipt_r13 import _large_star_join, _small_star_join  # noqa: E402

_LS_WIN, _SS_WIN = components._large_star, components._small_star


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark_ui(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    docs_dir = f"/tmp/dnp_scaled_x{k}_salted_docs"
    if not os.path.exists(os.path.join(docs_dir, "documents.parquet")):
        build_scaled(spark, k, docs_dir, docs_mode="salted", tables=("documents",))
    pairs_path = f"/tmp/dnp_cc_pairs_x{k}.parquet"
    if not os.path.exists(pairs_path):
        from detector_network_processor_spark.operators.dedup import minhash_signatures

        docs = load_table(spark, docs_dir, "documents")
        sigs = minhash_signatures(docs.select("doc_id", "text"), portable=True)
        minhash_lsh_pairs(sigs, portable=True, min_est=0.34).select(
            "doc_a", "doc_b"
        ).write.mode("overwrite").parquet(pairs_path)
        release_cached(spark)

    edges = spark.read.parquet(pairs_path)
    n_edges = edges.count()

    def run(form: str):
        if form == "join":
            components._large_star, components._small_star = (
                _large_star_join, _small_star_join,
            )
        else:
            components._large_star, components._small_star = _LS_WIN, _SS_WIN
        release_cached(spark)
        spark.sparkContext.setJobDescription(f"cc/{form}")
        before = shuffle_totals(spark)
        t = time.time()
        out = components.connected_components(edges, "doc_a", "doc_b")
        row = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(node, component))"), F.lit(0)).alias("h"),
        ).collect()[0]
        wall = round(time.time() - t, 3)
        after = shuffle_totals(spark)
        spark.sparkContext.setJobDescription(None)
        components._large_star, components._small_star = _LS_WIN, _SS_WIN
        release_cached(spark)
        return wall, (int(row["n"]), int(row["h"])), {
            kk: after[kk] - before[kk] for kk in ("write", "spill_disk", "spill_mem")
        }

    runs = {"window": [], "join": []}
    bytes_ = {"window": [], "join": []}
    sigs = set()
    for i in range(reps):
        order = ["window", "join"]
        if i % 2:
            order.reverse()
        for form in order:
            wall, sig, by = run(form)
            runs[form].append(wall)
            bytes_[form].append(by)
            sigs.add(sig)
            print(f"# {form} run{i}: {wall}s {by} sig={sig}", flush=True)
    assert len(sigs) == 1, sigs
    print(json.dumps({
        "k": k, "n_edges": n_edges, "runs": runs, "bytes": bytes_,
        "min": {f: min(r) for f, r in runs.items()},
        "pairwise_window_wins": sum(
            1 for a, b in zip(runs["window"], runs["join"]) if a < b
        ),
        "sig": list(next(iter(sigs))),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
