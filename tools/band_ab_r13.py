#!/usr/bin/env python
"""r13 adjudication of the pair-histogram band-join shape in a FORCED-SHUFFLE
regime (VERDICT r12 next-round #1).

The 3-bucket-explode shape (current, plans/muon.py::_pair_hist_df) was proven
optimal at sf0.1 only while the band join stays a BROADCAST: the explode's 3x
fan-out never crosses an exchange there. This tool re-runs the committed-receipt
2-join variant (same-bucket join + adjacent-bucket join union — provably the
same pair multiset) against the current shape where BOTH sides shuffle:

- data: K-fold replicated events (scale_bench.build_scaled, events only) so
  the hit stream is big enough to be honest;
- regime A ("auto"): session defaults (what the driver bench sees);
- regime B ("shuffle"): spark.sql.autoBroadcastJoinThreshold=-1 — every band
  join becomes a shuffle join, the 100 TB regime where the fan-out crosses an
  exchange.

For each (regime, shape) it reports interleaved wall times (noop sink), the
join strategy actually planned, and bytes shuffled (UI REST API, delta of
completed-stage shuffle write bytes). Output identity is asserted by xor-hash
over all rows before any timing.

Usage: python tools/band_ab_r13.py [K] [reps]
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

from detector_network_processor_spark.constants import MAX_TIME_NS  # noqa: E402
from detector_network_processor_spark.functions.geodesy import _ecef_cols  # noqa: E402
from detector_network_processor_spark.operators.histogram import (  # noqa: E402
    N_BINS,
    bin_width_expr,
)
from detector_network_processor_spark.plans.muon import muonize_events  # noqa: E402
from detector_network_processor_spark.session import release_cached  # noqa: E402
from scale_bench import build_scaled  # noqa: E402

MAX_DT = int(MAX_TIME_NS)


def get_spark_ui(cpus: str) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("band-ab-r13")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.locality.wait", "0s")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")
        # byte deltas are read from the completed-stage listing — keep every
        # stage of a long A/B retained or the totals silently shrink
        .config("spark.ui.retainedStages", "100000")
        .config("spark.ui.retainedJobs", "30000")
        .getOrCreate()
    )


def _hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = muonize_events(spark, sf_dir).select("hash", "start", "lat", "lon", "h")
    ex, ey, ez = _ecef_cols(F.col("lat"), F.col("lon"), F.col("h"))
    return h.select("hash", "start", ex.alias("x"), ey.alias("y"), ez.alias("z"))


def _finish(pairs: DataFrame) -> DataFrame:
    dist = F.sqrt(
        (F.col("x_a") - F.col("x_b")) * (F.col("x_a") - F.col("x_b"))
        + (F.col("y_a") - F.col("y_b")) * (F.col("y_a") - F.col("y_b"))
        + (F.col("z_a") - F.col("z_b")) * (F.col("z_a") - F.col("z_b"))
    )
    binned = (
        pairs.withColumn("distance", F.round(dist, 3))
        .withColumn("bin_width", bin_width_expr(dist))
        .withColumn("bin", F.floor((F.col("dt") + F.col("bin_width") * (N_BINS // 2)) / F.col("bin_width")))
        .filter((F.col("bin") >= 0) & (F.col("bin") < N_BINS))
    )
    return binned.groupBy("hash_lo", "hash_hi", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("distance").alias("distance"),
        F.min("bin_width").alias("bin_width"),
    )


def shape_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current production shape: 3-bucket explode on the a-side, plain
    bucket on the b-side, one equi-join."""
    hits = _hits(spark, sf_dir)
    bkt = F.expr(f"start div {MAX_DT}")
    a = hits.withColumn("bucket", F.explode(F.array(bkt - 1, bkt, bkt + 1))).select(
        F.col("hash").alias("hash_lo"), F.col("start").alias("start_a"),
        F.col("x").alias("x_a"), F.col("y").alias("y_a"), F.col("z").alias("z_a"), "bucket",
    )
    b = hits.withColumn("bucket", bkt).select(
        F.col("hash").alias("hash_hi"), F.col("start").alias("start_b"),
        F.col("x").alias("x_b"), F.col("y").alias("y_b"), F.col("z").alias("z_b"), "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .filter((F.col("hash_lo") < F.col("hash_hi")) & (F.abs(F.col("start_a") - F.col("start_b")) <= MAX_DT))
        .select(
            "hash_lo", "hash_hi", (F.col("start_a") - F.col("start_b")).alias("dt"),
            "x_a", "y_a", "z_a", "x_b", "y_b", "z_b",
        )
    )
    return _finish(pairs)


def shape_twojoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r12 receipt variant: same-bucket pairs from join 1, bucket-
    straddling pairs exactly once from join 2 (lower-bucket side joined to
    bucket+1), hash roles fixed after the join. No explode: each side of
    each join carries the hit stream exactly once."""
    hits = _hits(spark, sf_dir)
    bkt = F.expr(f"start div {MAX_DT}")
    base = hits.withColumn("bucket", bkt)

    lo = base.select(
        F.col("hash").alias("hash_x"), F.col("start").alias("start_x"),
        F.col("x").alias("x_x"), F.col("y").alias("y_x"), F.col("z").alias("z_x"), "bucket",
    )
    hi = base.select(
        F.col("hash").alias("hash_y"), F.col("start").alias("start_y"),
        F.col("x").alias("x_y"), F.col("y").alias("y_y"), F.col("z").alias("z_y"), "bucket",
    )

    # join 1: same bucket, orient by hash
    same = lo.join(hi, "bucket").filter(
        (F.col("hash_x") < F.col("hash_y"))
        & (F.abs(F.col("start_x") - F.col("start_y")) <= MAX_DT)
    )

    # join 2: x in bucket k, y in bucket k+1 — every straddling pair appears
    # exactly once with x the earlier-bucket hit; hashes may be either order
    straddle = (
        lo.withColumn("bucket", F.col("bucket") + 1)
        .join(hi, "bucket")
        .filter(
            (F.col("hash_x") != F.col("hash_y"))
            & (F.abs(F.col("start_x") - F.col("start_y")) <= MAX_DT)
        )
    )

    def orient(df: DataFrame) -> DataFrame:
        x_is_lo = F.col("hash_x") < F.col("hash_y")
        return df.select(
            F.least("hash_x", "hash_y").alias("hash_lo"),
            F.greatest("hash_x", "hash_y").alias("hash_hi"),
            F.when(x_is_lo, F.col("start_x") - F.col("start_y"))
            .otherwise(F.col("start_y") - F.col("start_x"))
            .alias("dt"),
            F.when(x_is_lo, F.col("x_x")).otherwise(F.col("x_y")).alias("x_a"),
            F.when(x_is_lo, F.col("y_x")).otherwise(F.col("y_y")).alias("y_a"),
            F.when(x_is_lo, F.col("z_x")).otherwise(F.col("z_y")).alias("z_a"),
            F.when(x_is_lo, F.col("x_y")).otherwise(F.col("x_x")).alias("x_b"),
            F.when(x_is_lo, F.col("y_y")).otherwise(F.col("y_x")).alias("y_b"),
            F.when(x_is_lo, F.col("z_y")).otherwise(F.col("z_x")).alias("z_b"),
        )

    pairs = orient(same).unionByName(orient(straddle))
    return _finish(pairs)


def xor_hash(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(hash_lo, hash_hi, bin, n, distance, bin_width))"),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _rest(spark: SparkSession, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def shuffle_totals(spark: SparkSession) -> dict:
    tot = {"write": 0, "read": 0, "spill_disk": 0, "spill_mem": 0}
    for st in _rest(spark, "stages?status=COMPLETE"):
        tot["write"] += st.get("shuffleWriteBytes", 0)
        tot["read"] += st.get("shuffleReadBytes", 0)
        tot["spill_disk"] += st.get("diskBytesSpilled", 0)
        tot["spill_mem"] += st.get("memoryBytesSpilled", 0)
    return tot


def join_kinds(df: DataFrame) -> dict:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    return {
        k: txt.count(k)
        for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "Exchange")
    }


def timed(spark: SparkSession, df: DataFrame, label: str) -> tuple[float, dict]:
    spark.sparkContext.setJobDescription(label)
    before = shuffle_totals(spark)
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t
    after = shuffle_totals(spark)
    spark.sparkContext.setJobDescription(None)
    return dt, {k: after[k] - before[k] for k in after}


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark_ui(cpus)
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = f"/tmp/dnp_scaled_x{k}_events"
    if not os.path.exists(os.path.join(scaled, "events.parquet")):
        build_scaled(spark, k, scaled, tables=("events",))

    # output identity first (1x and Kx, auto regime)
    for sf in (base, scaled):
        he = xor_hash(shape_explode(spark, sf))
        ht = xor_hash(shape_twojoin(spark, sf))
        tag = "1x" if sf == base else f"{k}x"
        print(f"# xor {tag}: explode={he} twojoin={ht} match={he == ht}", flush=True)
        if he != ht:
            print(json.dumps({"error": "output mismatch", "sf": sf}))
            return 1

    results = {}
    for regime, thresh in (("auto", None), ("shuffle", "-1")):
        if thresh is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        kinds = {
            "explode": join_kinds(shape_explode(spark, scaled)),
            "twojoin": join_kinds(shape_twojoin(spark, scaled)),
        }
        runs = {"explode": [], "twojoin": []}
        bytes_ = {"explode": [], "twojoin": []}
        for i in range(reps):
            for name, fn in (("explode", shape_explode), ("twojoin", shape_twojoin)):
                release_cached(spark)
                dt, sb = timed(spark, fn(spark, scaled), f"{regime}/{name}/{i}")
                runs[name].append(round(dt, 3))
                bytes_[name].append(sb)
                print(f"# {regime} {name} run{i}: {dt:.3f}s shuffle={sb}", flush=True)
        results[regime] = {"kinds": kinds, "runs": runs, "bytes": bytes_}
        if thresh is not None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    print(json.dumps({"k": k, "cpus": cpus, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
