#!/usr/bin/env python
"""r13 interleaved A/B for the chunked-reduceat MinHash signature kernel
(guide §4.2): per-document numpy calls (r10 form, reconstructed verbatim
below) vs one segmented pass per ~2^16 flattened shingles (current).

Runs the full bench queries whose wall includes the signature stage —
near_dup_jaccard (headline) and minhash_near_dup — interleaved min-of-N at
sf0.1 and at Kx salted docs, with per-cycle output xor identity.

Usage: python tools/sigkernel_ab_r13.py [docs_k] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from detector_network_processor_spark.operators import dedup  # noqa: E402
from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.session import get_spark, release_cached  # noqa: E402
from scale_bench import build_scaled  # noqa: E402


def make_per_doc_udf():
    """The r10 per-document kernel, verbatim."""
    from pyspark.sql.types import ArrayType, LongType

    params = dedup._permutation_params()
    a_list = [a for a, _ in params]
    b_list = [b for _, b in params]

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(hs: pd.Series) -> pd.Series:
        import numpy as np

        a = np.array(a_list, dtype=np.int64)
        b = np.array(b_list, dtype=np.int64)
        out = []
        for arr in hs:
            h = np.asarray(arr, dtype=np.int64) % dedup._MERSENNE_P
            out.append(((h[:, None] * a + b) % dedup._MERSENNE_P).min(axis=0))
        return pd.Series(out)

    return _sig


def xor_hash(df):
    cols = ", ".join(df.columns)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({cols}))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="sigkernel-ab-r13")
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = f"/tmp/dnp_scaled_x{k}_salted_docs"
    if not os.path.exists(os.path.join(scaled, "documents.parquet")):
        build_scaled(spark, k, scaled, docs_mode="salted", tables=("documents",))

    specs = all_queries()
    new_udf = dedup._make_signature_udf()
    old_udf = make_per_doc_udf()
    report = {"k": k, "reps": reps}
    for tag, sf, queries in (
        ("1x", base, ["near_dup_jaccard", "minhash_near_dup"]),
        (f"{k}x", scaled, ["minhash_near_dup"]),
    ):
        report[tag] = {}
        for q in queries:
            sig = {}
            for side, udf in (("new", new_udf), ("old", old_udf)):
                dedup._SIGNATURE_UDF = udf
                sig[side] = xor_hash(specs[q].fn(spark, sf))
                release_cached(spark)
            assert sig["new"] == sig["old"], (q, sig)
            runs = {"new": [], "old": []}
            for i in range(reps):
                order = [("new", new_udf), ("old", old_udf)]
                if i % 2:
                    order.reverse()
                for side, udf in order:
                    dedup._SIGNATURE_UDF = udf
                    release_cached(spark)
                    spark.sparkContext.setJobDescription(f"{tag}/{q}/{side}/{i}")
                    t = time.time()
                    specs[q].fn(spark, sf).write.format("noop").mode("overwrite").save()
                    runs[side].append(round(time.time() - t, 3))
                    spark.sparkContext.setJobDescription(None)
            dedup._SIGNATURE_UDF = new_udf
            report[tag][q] = {
                "runs": runs,
                "min": {s: min(r) for s, r in runs.items()},
                "pairwise_new_wins": sum(
                    1 for x, y in zip(runs["new"], runs["old"]) if x < y
                ),
                "xor": list(sig["new"]),
            }
            print(f"# {tag} {q}: {json.dumps(report[tag][q])}", flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
