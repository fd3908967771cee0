#!/usr/bin/env python
"""r13 scaling receipts (VERDICT r12 #2): back the r12 structural claims
with measured wall + bytes-shuffled deltas at 10x/30x events and
10x/100x documents, where sf0.1's job floor can no longer hide them.

Three interleaved A/Bs, r11 shape vs current shape, each isolating ONE r12
change (the r11 sides are reconstructed verbatim from git — 195cdc4~1 for
the pre-ECEF pair histogram and the persist loops, 349c15c~1 for the
join-form stars via tools/skew_receipt_r13):

  prefix   — _pair_hist_df: per-PAIR WGS84 trig (r11) vs per-HIT ECEF
             hoist (r12), noop sink on the full histogram.
  loops    — station_{pagerank,communities}_converged: persist +
             every-10th-checkpoint loop (r11) vs per-iteration tracked
             eager checkpoints (r12), both on the CURRENT edge prefix so
             the loop rework is isolated; iteration counts asserted equal.
  stars    — dedup_components(_lsh): join-form stars (r11) vs window-form
             (r12) + observe-fold (r13), full query, salted-docs scaling
             (pair output grows ~K, the linear crawl regime).

Usage: python tools/scale_receipts_r13.py [--events-k K] [--docs-k K] [reps]
Writes one JSON line; bytes from the UI REST API (completed stages delta).
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
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402

from detector_network_processor_spark.constants import MAX_TIME_NS  # noqa: E402
from detector_network_processor_spark.functions.geodesy import straight_distance_col  # noqa: E402
from detector_network_processor_spark.operators import components  # noqa: E402
from detector_network_processor_spark.operators.histogram import N_BINS, bin_width_expr  # noqa: E402
from detector_network_processor_spark.plans import all_queries  # noqa: E402
from detector_network_processor_spark.plans import muon  # noqa: E402
from detector_network_processor_spark.session import release_cached  # noqa: E402
from scale_bench import build_scaled  # noqa: E402
from tools.band_ab_r13 import get_spark_ui, shuffle_totals  # noqa: E402
from tools.skew_receipt_r13 import _large_star_join, _small_star_join  # noqa: E402


# ---- r11 pre-ECEF pair histogram, verbatim from 195cdc4~1 ----------------
def pair_hist_r11(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muon.muonize_events(spark, sf_dir).select("hash", "start", "lat", "lon", "h")
    max_dt = int(MAX_TIME_NS)
    bkt = F.expr(f"start div {max_dt}")
    a = hits.withColumn("bucket", F.explode(F.array(bkt - 1, bkt, bkt + 1))).select(
        F.col("hash").alias("hash_lo"), F.col("start").alias("start_a"),
        F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"), F.col("h").alias("h_a"), "bucket",
    )
    b = hits.withColumn("bucket", bkt).select(
        F.col("hash").alias("hash_hi"), F.col("start").alias("start_b"),
        F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"), F.col("h").alias("h_b"), "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter((F.col("hash_lo") < F.col("hash_hi")) & (F.abs(F.col("start_a") - F.col("start_b")) <= max_dt))
        .select(
            "hash_lo", "hash_hi", (F.col("start_a") - F.col("start_b")).alias("dt"),
            "lat_a", "lon_a", "h_a", "lat_b", "lon_b", "h_b",
        )
    )
    dist = straight_distance_col(
        F.col("lat_a"), F.col("lon_a"), F.col("h_a"), F.col("lat_b"), F.col("lon_b"), F.col("h_b")
    )
    binned = (
        pairs.withColumn("distance", F.round(dist, 3))
        .withColumn("bin_width", bin_width_expr(dist))
        .withColumn("bin", F.floor((F.col("dt") + F.col("bin_width") * (N_BINS // 2)) / F.col("bin_width")))
        .filter((F.col("bin") >= 0) & (F.col("bin") < N_BINS))
    )
    return (
        binned.groupBy("hash_lo", "hash_hi", "bin")
        .agg(F.count(F.lit(1)).alias("n"), F.min("distance").alias("distance"), F.min("bin_width").alias("bin_width"))
        .orderBy("hash_lo", "hash_hi", "bin")
    )


# ---- r11 persist loops, verbatim from 195cdc4~1 (on the CURRENT edges) ---
def lpa_converged_r11(spark: SparkSession, sf_dir: str, max_iters: int = 20):
    edges = muon._station_edges(spark, sf_dir)
    labels = (
        edges.select(F.col("u").alias("v")).distinct().withColumn("lbl", F.col("v")).persist()
    )
    w_pick = Window.partitionBy("v").orderBy(F.col("wt").desc(), F.col("lbl"))
    iters = 0
    for _ in range(max_iters):
        nxt = (
            edges.join(F.broadcast(labels.select(F.col("v").alias("u"), "lbl")), "u")
            .groupBy("v", "lbl")
            .agg(F.sum("w").cast("long").alias("wt"))
            .withColumn("rn", F.row_number().over(w_pick))
            .filter(F.col("rn") == 1)
            .select("v", "lbl")
            .persist()
        )
        iters += 1
        changed = (
            nxt.alias("n").join(labels.alias("p"), "v").filter(F.col("n.lbl") != F.col("p.lbl")).count()
        )
        labels.unpersist()
        labels = nxt
        if iters % 10 == 0:
            ckpt = labels.localCheckpoint(eager=True)
            labels.unpersist()
            labels = ckpt
        if changed == 0:
            break
    w_size = Window.partitionBy("lbl")
    out = (
        labels.withColumn("community_size", F.count(F.lit(1)).over(w_size).cast("long"))
        .select(F.col("v").alias("hash"), F.col("lbl").alias("community"), "community_size")
        .orderBy("hash")
    )
    return out, iters


def pr_converged_r11(spark: SparkSession, sf_dir: str, max_iters: int = 50, tol12: int = 1_000_000):
    edges = muon._station_edges(spark, sf_dir)
    deg = edges.groupBy("u").agg(F.sum("w").cast("long").alias("wsum"))
    n = deg.count()
    base = muon._PR_BASE_MASS // n
    ranks = deg.select(
        F.col("u").alias("v"), F.lit(muon._PR_SCALE // n).cast("long").alias("r")
    ).persist()
    ew = edges.join(F.broadcast(deg), "u").localCheckpoint(eager=True)
    iters = 0
    for _ in range(max_iters):
        nxt = (
            ew.join(F.broadcast(ranks.withColumnRenamed("v", "u")), "u")
            .select("v", F.expr("(r * w) div wsum").alias("contrib"))
            .groupBy("v")
            .agg((F.lit(base) + F.expr("(sum(contrib) * 17) div 20")).cast("long").alias("r"))
            .persist()
        )
        iters += 1
        delta = (
            nxt.alias("n")
            .join(ranks.alias("p"), "v")
            .agg(F.max(F.abs(F.col("n.r") - F.col("p.r"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks.unpersist()
        ranks = nxt
        if iters % 10 == 0:
            ckpt = ranks.localCheckpoint(eager=True)
            ranks.unpersist()
            ranks = ckpt
        if delta is not None and delta <= tol12:
            break
    out = ranks.select(
        F.col("v").alias("hash"), F.col("r").alias("rank12"),
        F.round(F.col("r") / 1_000_000.0 / 1_000_000.0, 6).alias("rank"),
    ).orderBy("hash")
    return out, iters


_LS_WIN, _SS_WIN = components._large_star, components._small_star


def timed(spark, label, fn):
    """One measured run: wall + completed-stage byte deltas; returns rows."""
    release_cached(spark)
    spark.sparkContext.setJobDescription(label)
    before = shuffle_totals(spark)
    t = time.time()
    meta = fn()
    wall = round(time.time() - t, 3)
    after = shuffle_totals(spark)
    spark.sparkContext.setJobDescription(None)
    release_cached(spark)
    return wall, {k: after[k] - before[k] for k in ("write", "spill_disk")}, meta


def ab(spark, name, sides, reps):
    """Interleaved min-of-N over {side_name: thunk}; thunk returns meta."""
    out = {s: {"runs": [], "bytes": [], "meta": []} for s in sides}
    for i in range(reps):
        items = list(sides.items())
        if i % 2:
            items.reverse()
        for s, fn in items:
            wall, by, meta = timed(spark, f"{name}/{s}/{i}", fn)
            out[s]["runs"].append(wall)
            out[s]["bytes"].append(by)
            out[s]["meta"].append(meta)
            print(f"# {name} {s} run{i}: {wall}s {by} meta={meta}", flush=True)
    for s in out:
        out[s]["min"] = min(out[s]["runs"])
    return out


def noop(df: DataFrame):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    args = sys.argv[1:]

    def opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = int(args[i + 1])
            del args[i : i + 2]
            return v
        return default

    events_k = opt("--events-k", 10)
    docs_k = opt("--docs-k", 100)
    reps = int(args[0]) if args else 3
    which = args[1:] or ["prefix", "loops", "stars"]

    spark = get_spark_ui(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    report = {"events_k": events_k, "docs_k": docs_k, "reps": reps}

    if {"prefix", "loops"} & set(which):
        ev_dir = f"/tmp/dnp_scaled_x{events_k}_events"
        if not os.path.exists(os.path.join(ev_dir, "events.parquet")):
            build_scaled(spark, events_k, ev_dir, tables=("events",))

    if "prefix" in which:
        report["prefix"] = ab(
            spark, "prefix",
            {
                "r12_ecef_hoist": lambda: noop(muon._pair_hist_df(spark, ev_dir)),
                "r11_per_pair_trig": lambda: noop(pair_hist_r11(spark, ev_dir)),
            },
            reps,
        )

    if "loops" in which:
        def run_loop(fn):
            out, iters = fn()
            noop(out)
            return iters

        report["loops"] = {
            "lpa": ab(
                spark, "lpa_converged",
                {
                    "r12_ckpt_loop": lambda: run_loop(
                        lambda: muon.station_communities_converged(spark, ev_dir)
                    ),
                    "r11_persist_loop": lambda: run_loop(lambda: lpa_converged_r11(spark, ev_dir)),
                },
                reps,
            ),
            "pagerank": ab(
                spark, "pr_converged",
                {
                    "r12_ckpt_loop": lambda: run_loop(
                        lambda: muon.station_pagerank_converged(spark, ev_dir)
                    ),
                    "r11_persist_loop": lambda: run_loop(lambda: pr_converged_r11(spark, ev_dir)),
                },
                reps,
            ),
        }

    if "stars" in which:
        docs_dir = f"/tmp/dnp_scaled_x{docs_k}_salted_docs"
        if not os.path.exists(os.path.join(docs_dir, "documents.parquet")):
            build_scaled(spark, docs_k, docs_dir, docs_mode="salted", tables=("documents",))
        specs = all_queries()

        def run_q(qname, star_form):
            if star_form == "join":
                components._large_star, components._small_star = (
                    _large_star_join, _small_star_join,
                )
            else:
                components._large_star, components._small_star = _LS_WIN, _SS_WIN
            try:
                noop(specs[qname].fn(spark, docs_dir))
            finally:
                components._large_star, components._small_star = _LS_WIN, _SS_WIN
            return None

        report["stars"] = {
            q: ab(
                spark, q,
                {
                    "r12_window_stars": lambda q=q: run_q(q, "window"),
                    "r11_join_stars": lambda q=q: run_q(q, "join"),
                },
                reps,
            )
            for q in ("dedup_components", "dedup_components_lsh")
        }

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
