#!/usr/bin/env python
"""r13 skew receipt for the window-form star contraction (VERDICT r12 #3).

The r12 rewrite replaced groupBy-min + join-back with a single window MIN
pass per star. The acknowledged trade: the old shape computed the hot
node's min via map-side partials, the window buffers the celebrity node's
whole neighborhood in ONE task's spillable sorter. This tool measures that
regime directly:

- synthetic celebrity graph: one hub with D neighbors (D = 1e5 / 1e6) on
  top of a random background graph (1M edges over 500k nodes) that gives
  the contraction several rounds;
- window form (current) vs the r11 join form (reconstructed below, verbatim
  from git 349c15c~1) through the FULL connected_components loop;
- wall, shuffle bytes, spill bytes (UI REST), output identity (count +
  xor over (node, component));
- a forced-spill run: spark.sql.windowExec.buffer.spill.threshold dropped
  to 64k rows so the hub group demonstrably exercises the
  UnsafeExternalSorter spill path and still completes correctly.

Usage: python tools/skew_receipt_r13.py [hub_degrees ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from detector_network_processor_spark.operators import components  # noqa: E402
from detector_network_processor_spark.session import release_cached  # noqa: E402
from tools.band_ab_r13 import get_spark_ui  # noqa: E402


# ---- r11 join-form stars, verbatim from git 349c15c~1 (the A/B reference)
def _large_star_join(edges: DataFrame) -> DataFrame:
    sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star_join(edges: DataFrame) -> DataFrame:
    mins = edges.groupBy("a").agg(F.min("b").alias("m"))
    j = edges.join(mins, "a")
    leaf_edges = j.filter(F.col("b") != F.col("m")).select(
        F.col("b").alias("a"), F.col("m").alias("b")
    )
    root_edges = mins.select(F.col("a"), F.col("m").alias("b"))
    return leaf_edges.union(root_edges).filter(F.col("a") != F.col("b")).distinct()


def celebrity_graph(spark: SparkSession, hub_degree: int, bg_edges: int = 1_000_000,
                    bg_nodes: int = 500_000) -> DataFrame:
    """Hub node 1 connected to hub_degree dedicated satellites (ids above
    the background range), plus a random background graph. Deterministic
    (xxhash64-derived endpoints, no rand())."""
    hub = spark.range(hub_degree).select(
        F.lit(1).cast("long").alias("src"),
        (F.col("id") + 10_000_000).cast("long").alias("dst"),
    )
    bg = spark.range(bg_edges).select(
        (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % bg_nodes + 2).cast("long").alias("src"),
        (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % bg_nodes + 2).cast("long").alias("dst"),
    )
    return hub.unionByName(bg)


def _rest(spark: SparkSession, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/applications/{app}/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def totals(spark: SparkSession) -> dict:
    t = {"shuffle_write": 0, "spill_disk": 0, "spill_mem": 0, "max_task_sec": 0.0}
    for st in _rest(spark, "stages?status=COMPLETE"):
        t["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        t["spill_disk"] += st.get("diskBytesSpilled", 0)
        t["spill_mem"] += st.get("memoryBytesSpilled", 0)
    return t


def run_cc(spark: SparkSession, edges: DataFrame, form: str) -> dict:
    if form == "join":
        components._large_star, components._small_star = _large_star_join, _small_star_join
    else:
        components._large_star, components._small_star = _LS_WIN, _SS_WIN
    release_cached(spark)
    before = totals(spark)
    t = time.time()
    out = components.connected_components(edges)
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(node, component))"), F.lit(0)).alias("h"),
    ).collect()[0]
    wall = round(time.time() - t, 3)
    after = totals(spark)
    release_cached(spark)
    return {
        "wall": wall,
        "sig": (int(row["n"]), int(row["h"])),
        "delta": {k: after[k] - before[k] for k in ("shuffle_write", "spill_disk", "spill_mem")},
    }


_LS_WIN, _SS_WIN = components._large_star, components._small_star


def main() -> int:
    degrees = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark_ui(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    report = {}
    for d in degrees:
        # pure range-derived lineage — rebuilt per run, never cached (the
        # per-run release_cached would drop a checkpointed input)
        edges = celebrity_graph(spark, d)
        res = {}
        for form in ("window", "join", "window"):  # window twice: warmup asymmetry guard
            key = form if form not in res else form + "2"
            res[key] = run_cc(spark, edges, form)
            print(f"# D={d} {key}: {res[key]}", flush=True)
        assert res["window"]["sig"] == res["join"]["sig"], (d, res)
        # forced-spill demonstration: hub group through the window sorter's
        # spill path (threshold 64k rows < D), must complete and agree
        spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "65536")
        res["window_forced_spill"] = run_cc(spark, edges, "window")
        spark.conf.unset("spark.sql.windowExec.buffer.spill.threshold")
        print(f"# D={d} forced-spill: {res['window_forced_spill']}", flush=True)
        assert res["window_forced_spill"]["sig"] == res["window"]["sig"]
        report[str(d)] = res
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
