"""Scaling-evidence harness: replicate the sf0.1 fixtures K-fold into a
temp directory (deterministic id/timestamp offsets per replica, replica
tokens appended to document text so near-dup structure stays realistic),
then time a set of heavyweight queries at 1x and Kx on the SAME session.

Usage:
    python scale_bench.py [K] [query ...]

Prints one JSON line:
    {"factor": K, "queries": {name: {"t1": s, "tK": s, "ratio": r,
                                     "rows1": n, "rowsK": n}}}

The point is the RATIO: a plan that survives 100 TB should scale
near-linearly (ratio ~= K for O(n) operators, and distinctly sub-K x K
for per-session kernels whose parallelism widens with the data). A
super-linear ratio is the smoke test for a hidden quadratic.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import pyspark.sql.functions as F

from detector_network_processor_spark.io import load_table
from detector_network_processor_spark.plans import all_queries
from detector_network_processor_spark.session import get_spark

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "l1_coincidence",
    "station_lifecycle",
    "sessionize_events",
    "coincidence_pairs",
    "window_sliding_stats",
    "dedup_exact",
    "near_dup_jaccard",
    "gap_fill_locf",
    "bm25_search",
    "q1_pricing_summary",
    "dsir_importance",
    "bpe_train_merges",
]

# tables the heavy queries read; everything else is linked as-is
_SCALED = ("events", "documents", "embeddings")


def build_scaled(spark, factor: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").alias("_rep"))

    ev = load_table(spark, BASE_SF, "events")
    n_ev = ev.count()
    scaled_ev = (
        ev.crossJoin(F.broadcast(rep))
        .select(
            (F.col("event_id") + F.col("_rep") * n_ev).alias("event_id"),
            # shift each replica by a few minutes so sessions interleave
            # instead of duplicating exactly (density grows ~K-fold)
            (F.col("ts") + F.make_dt_interval(F.lit(0), F.lit(0), (F.col("_rep") * 7).cast("int"), F.lit(0))).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    scaled_ev.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    docs = load_table(spark, BASE_SF, "documents")
    n_doc = docs.count()
    (
        docs.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") + F.col("_rep") * n_doc).alias("doc_id"),
            # vary each replica's text so near-dup finds structure, not
            # wall-to-wall exact copies
            F.concat(F.col("text"), F.lit(" rep"), F.col("_rep")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 6).alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    emb = load_table(spark, BASE_SF, "embeddings")
    n_vec = emb.count()
    (
        emb.crossJoin(F.broadcast(rep))
        .select(
            (F.col("vec_id") + F.col("_rep") * n_vec).alias("vec_id"),
            "embedding",
            "label",
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )

    for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        src = os.path.join(BASE_SF, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)


def time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    fn = all_queries()[name].fn
    best, rows = None, 0
    for _ in range(2):
        t = time.time()
        rows = fn(spark, sf_dir).count()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        for _id, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist(True)
    return best, rows


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="dnp-scale-bench")
    out_dir = f"/tmp/dnp_scaled_x{factor}"
    if not os.path.exists(os.path.join(out_dir, "events.parquet")):
        build_scaled(spark, factor, out_dir)
    results = {}
    for name in names:
        t1, r1 = time_query(spark, name, BASE_SF)
        tk, rk = time_query(spark, name, out_dir)
        results[name] = {
            "t1": round(t1, 3),
            "tK": round(tk, 3),
            "ratio": round(tk / t1, 2),
            "rows1": r1,
            "rowsK": rk,
        }
        print(f"# {name}: {t1:.2f}s -> {tk:.2f}s (x{tk / t1:.1f})", file=sys.stderr)
    print(json.dumps({"factor": factor, "base": BASE_SF, "queries": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
