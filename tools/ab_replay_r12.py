#!/usr/bin/env python
"""One-off interleaved A/B for the r12 neardup-replay pair-stage redesign
(r11 verdict next-round #3 / r10 stretch #9): OLD shape = two join
pipelines per batch (intra self-join via the pre-r12 minhash_lsh_pairs
form + a separate history join), each dedup-shuffling 64-slot signature
arrays; NEW shape = the library code (one union-side collision join,
score+threshold before a narrow pair dedup). Both run the full 4-batch
replay dataflow end-to-end (writes included) in ONE session, interleaved
A/B/A/B..., bracketed by the window_sliding_stats probe — the measurement
protocol every round's SCALING.md numbers use on this noisy host.

Writes JSON to $AB_OUT (default /tmp/ab_replay_r12.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F  # noqa: E402

from detector_network_processor_spark.io import load_table  # noqa: E402
from detector_network_processor_spark.operators.dedup import (  # noqa: E402
    MINHASH_K,
    band_rows,
    minhash_signatures,
)
from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402
from detector_network_processor_spark.streaming.dedup import (  # noqa: E402
    _index_exists,
    process_neardup_increment,
)

THRESHOLD = 0.34


def old_increment(spark, batch_docs, index_path, out_path, batch_id):
    """The pre-r12 process_neardup_increment dataflow, verbatim: intra
    pairs from the OLD minhash_lsh_pairs shape (pair-dedup aggregate over
    first(sig_a)/first(sig_b), scored after), plus a separate history
    join with the same wide aggregate."""
    sigs = minhash_signatures(
        batch_docs.select("doc_id", "text"), portable=True
    ).localCheckpoint(eager=True)
    new_bands = band_rows(sigs, portable=True)
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    est = F.round(agree / float(MINHASH_K), 6)

    exploded = new_bands
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a"), "band", "bhash"
    )
    b = exploded.select(
        F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b"), "band", "bhash"
    )
    intra = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= THRESHOLD)
    )
    pairs = intra
    if _index_exists(spark, index_path):
        hist = (
            spark.read.parquet(index_path)
            .filter(F.col("ingest_batch") < batch_id)
            .select(
                F.col("doc_id").alias("doc_a"),
                F.col("signature").alias("sig_a"),
                "band",
                "bhash",
            )
        )
        nb = new_bands.select(
            F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b"), "band", "bhash"
        )
        cross = (
            hist.join(nb, ["band", "bhash"])
            .filter(F.col("doc_a") != F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.first("sig_a").alias("sig_a"), F.first("sig_b").alias("sig_b"))
            .select("doc_a", "doc_b", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= THRESHOLD)
        )
        pairs = intra.unionByName(cross)
    pairs.write.mode("overwrite").parquet(os.path.join(out_path, f"batch_id={batch_id}"))
    new_bands.write.mode("overwrite").parquet(
        os.path.join(index_path, f"ingest_batch={batch_id}")
    )


def run_replay(spark, sf_dir: str, variant: str) -> tuple[float, int]:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix=f"dnp_ab_{variant}_")
    t0 = time.perf_counter()
    try:
        for b in range(4):
            batch = docs.filter(F.col("doc_id") % 4 == b)
            if variant == "old":
                old_increment(spark, batch, f"{root}/index", f"{root}/pairs", b)
            else:
                process_neardup_increment(
                    spark, batch, f"{root}/index", f"{root}/pairs", b,
                    threshold=THRESHOLD, portable=True,
                )
        n = (
            spark.read.parquet(f"{root}/pairs")
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
                "est_jaccard",
            )
            .dropDuplicates(["doc_a", "doc_b"])
            .count()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return time.perf_counter() - t0, n


def probe(spark, specs, sf_dir) -> float:
    release_cached(spark, jvm_gc=True, settle_sec=0.2)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        specs["window_sliding_stats"].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    spark = get_spark(app_name="ab-replay-r12", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    specs = all_queries()

    # warmup both variants at the smallest SF (JIT/codegen)
    for v in ("old", "new"):
        run_replay(spark, "/root/testdata/sf0.001", v)

    out = {"sf_dir": sf_dir, "probes": [], "old": [], "new": [], "pairs": {}}
    out["probes"].append(probe(spark, specs, sf_dir))
    for i in range(rounds):
        for v in ("old", "new") if i % 2 == 0 else ("new", "old"):
            release_cached(spark, jvm_gc=True, settle_sec=0.2)
            wall, n = run_replay(spark, sf_dir, v)
            out[v].append(round(wall, 3))
            out["pairs"][v] = n
        out["probes"].append(probe(spark, specs, sf_dir))
    out["min_old"] = min(out["old"])
    out["min_new"] = min(out["new"])
    out["speedup_min"] = round(out["min_old"] / out["min_new"], 3)
    print(json.dumps(out))
    with open(os.environ.get("AB_OUT", "/tmp/ab_replay_r12.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
