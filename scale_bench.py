"""Scaling-evidence harness: replicate the sf0.1 fixtures K-fold into a
temp directory (deterministic id/timestamp offsets per replica), then time
a set of heavyweight queries at 1x and Kx on the SAME session.

Document replication has TWO modes, because document growth has two real
regimes with opposite complexity behavior for pair-producing operators:

- ``clone`` (default, the historical mode): each replica appends a replica
  token to the END of the text, so the K replicas of a document are
  near-duplicates of each other. Models a crawl where the same pages are
  re-collected K times — the EXACT/clone-dedup regime. Near-dup pair
  OUTPUT grows ~K^2 per document by construction (every replica pair is a
  true near-dup pair): no pair-LISTING algorithm is linear here; the
  linear object is the CLUSTERING (lsh_star_edges -> components).
- ``salted``: every token of replica k>0 is prefixed with ``r<k>_``, so
  replicas share no shingles ACROSS replicas while each replica internally
  preserves the original corpus's near-dup structure exactly. Models a
  crawl that grows K-fold with fresh content — pair output grows ~K, and
  pair-listing operators should scale ~linearly.

Usage:
    python scale_bench.py [K] [--salted-docs] [query ...]

Prints one JSON line:
    {"factor": K, "docs_mode": m, "queries": {name: {"t1": s, "tK": s,
        "ratio": r, "rows1": n, "rowsK": n}}}

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


def build_scaled(
    spark,
    factor: int,
    out_dir: str,
    docs_mode: str = "clone",
    tables: tuple[str, ...] = _SCALED,
) -> None:
    """Replicate the base fixtures ``factor``-fold into ``out_dir``.

    ``tables`` restricts which of the heavy tables are scaled (the TPC-H
    dimension/fact tables are copied as-is only when scaling the full set)
    — a 1000x documents-only corpus is ~1 GB, while 1000x events would be
    a billion rows nothing here needs."""
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(factor).select(F.col("id").alias("_rep"))

    if "events" in tables:
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

    if "documents" not in tables:
        if "embeddings" in tables:  # pragma: no cover — no caller yet
            raise ValueError("embeddings-only scaling not supported")
        return

    docs = load_table(spark, BASE_SF, "documents")
    n_doc = docs.count()
    if docs_mode == "salted":
        # Replica 0 keeps the original text; replica k>0 prefixes EVERY
        # token with r<k>_ — replicas share zero shingles across replicas,
        # but within a replica the original near-dup structure is preserved
        # exactly (both members of a pair get the identical transformation).
        salted = F.when(F.col("_rep") == 0, F.col("text")).otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit("r"), F.col("_rep"), F.lit("_"), w),
                ),
            )
        )
        text_expr = salted
    elif docs_mode == "clone":
        # near-dup replicas: only the appended tail token differs
        text_expr = F.concat(F.col("text"), F.lit(" rep"), F.col("_rep"))
    else:  # pragma: no cover
        raise ValueError(f"unknown docs_mode {docs_mode!r}")
    (
        docs.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") + F.col("_rep") * n_doc).alias("doc_id"),
            text_expr.alias("text"),
            "lang",
            "source",
            F.length(text_expr).cast("long").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    if "embeddings" not in tables:
        return

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
    argv = [a for a in sys.argv[1:]]
    docs_mode = "clone"
    if "--salted-docs" in argv:
        docs_mode = "salted"
        argv.remove("--salted-docs")
    factor = int(argv[0]) if argv else 10
    names = argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="dnp-scale-bench")
    suffix = "_salted" if docs_mode == "salted" else ""
    out_dir = f"/tmp/dnp_scaled_x{factor}{suffix}"
    if not os.path.exists(os.path.join(out_dir, "events.parquet")):
        build_scaled(spark, factor, out_dir, docs_mode=docs_mode)
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
    print(json.dumps({"factor": factor, "base": BASE_SF, "docs_mode": docs_mode, "queries": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
