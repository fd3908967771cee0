"""Station-pair Δt histograms (SURVEY.md §2.6 A7-A9; reference
src/analysis/stationcoincidence.cpp:43-80 fill, :224-240 bin setup,
src/aggregation.cpp:125-203 offline merge).

Exact reference semantics:
- one entry per constituent pair of each n>=2 coincidence;
- Δt = t(lower-hash station) - t(higher-hash station)
  (stationcoincidence.cpp:72-77);
- per-pair bin width = clamp(2*tof / 2000, 1, 100) ns where tof is the
  straight-line distance / c (NO 150 ns floor here), range +-1000*width,
  2000 bins (stationcoincidence.cpp:235-238);
- out-of-range values are dropped.

Scale shape: pair explosion is JVM-side (transform/slice — no UDF), the
station dimension joins are broadcasts, and the aggregate is one hash
shuffle on (pair, bin) with map-side combine. The O(stations^2) histogram
"matrix" stays a distributed long-format table — never driver-side
(SURVEY.md §7.3).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..constants import C_M_PER_NS
from ..functions.geodesy import _ecef_cols

N_BINS = 2000
MAX_BIN_WIDTH_NS = 100.0  # s_total_width / s_bins = 200000/2000


def explode_constituent_pairs(l1: DataFrame) -> DataFrame:
    """L1 table (with `events` array) -> one row per constituent pair
    (i<j in list order), JVM-side."""
    n = F.size("events")
    pairs = F.flatten(
        F.transform(
            F.col("events"),
            lambda e1, i: F.transform(
                F.slice(F.col("events"), i + 2, n - i - 1), lambda e2: F.struct(e1.alias("a"), e2.alias("b"))
            ),
        )
    )
    return (
        l1.filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(
            F.least("p.a.hash", "p.b.hash").alias("hash_lo"),
            F.greatest("p.a.hash", "p.b.hash").alias("hash_hi"),
            # dt = t(lower hash) - t(higher hash), stationcoincidence.cpp:72-77
            F.when(F.col("p.a.hash") < F.col("p.b.hash"), F.col("p.a.start") - F.col("p.b.start"))
            .otherwise(F.col("p.b.start") - F.col("p.a.start"))
            .alias("dt"),
        )
    )


def bin_width_expr(distance_m) -> F.Column:
    """clamp(2 * tof / N_BINS, 1, 100) ns, truncated to int32."""
    tof = distance_m / F.lit(C_M_PER_NS)
    return F.greatest(
        F.lit(1.0), F.least(F.lit(MAX_BIN_WIDTH_NS), 2.0 * tof / F.lit(float(N_BINS)))
    ).cast("int")


def pair_dt_histogram(l1: DataFrame, stations: DataFrame) -> DataFrame:
    """A7: histogram counts per station pair.

    stations: (hash, lat, lon, h) dimension — broadcast twice.
    Returns (hash_lo, hash_hi, distance, bin_width, bin, n).
    """
    pairs = explode_constituent_pairs(l1)
    # ECEF per STATION in the broadcast dimension (r12, guide §2.3): the
    # old shape re-ran the WGS84 trig on every constituent-pair row; the
    # same expression tree applied to the O(stations) dimension leaves
    # only the chord sqrt per pair — bit-identical distance values.
    ex, ey, ez = _ecef_cols(F.col("lat"), F.col("lon"), F.col("h"))
    st = stations.select("hash", ex.alias("x"), ey.alias("y"), ez.alias("z"))
    a = F.broadcast(st.select(F.col("hash").alias("hash_lo"), F.col("x").alias("x_a"),
                              F.col("y").alias("y_a"), F.col("z").alias("z_a")))
    b = F.broadcast(st.select(F.col("hash").alias("hash_hi"), F.col("x").alias("x_b"),
                              F.col("y").alias("y_b"), F.col("z").alias("z_b")))
    dist = F.sqrt(
        (F.col("x_a") - F.col("x_b")) * (F.col("x_a") - F.col("x_b"))
        + (F.col("y_a") - F.col("y_b")) * (F.col("y_a") - F.col("y_b"))
        + (F.col("z_a") - F.col("z_b")) * (F.col("z_a") - F.col("z_b"))
    )
    enriched = (
        pairs.join(a, "hash_lo")
        .join(b, "hash_hi")
        .withColumn("distance", F.round(dist, 3))
        .withColumn("bin_width", bin_width_expr(dist))
    )
    half = F.lit(N_BINS // 2)
    binned = enriched.withColumn(
        "bin", F.floor((F.col("dt") + F.col("bin_width") * half) / F.col("bin_width"))
    ).filter((F.col("bin") >= 0) & (F.col("bin") < N_BINS))
    return (
        binned.groupBy("hash_lo", "hash_hi", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("distance").alias("distance"),
            F.min("bin_width").alias("bin_width"),
        )
        .select("hash_lo", "hash_hi", "distance", "bin_width", "bin", "n")
    )


def pair_totals(hist: DataFrame) -> DataFrame:
    """A8 adjacency data: total coincidence counts per station pair (long
    format; pivot with ``groupBy('hash_lo').pivot('hash_hi')`` only for
    small networks/debug output)."""
    return hist.groupBy("hash_lo", "hash_hi").agg(F.sum("n").alias("total"))


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """A9 offline aggregation (reference src/aggregation.cpp:125-203): sum
    per-bin counts across saved histogram tables; metadata (distance,
    bin_width) is per-pair constant and carried through."""
    it = iter(hists)
    merged = next(it)
    for h in it:
        merged = merged.unionByName(h)
    return (
        merged.groupBy("hash_lo", "hash_hi", "bin")
        .agg(F.sum("n").alias("n"), F.min("distance").alias("distance"), F.min("bin_width").alias("bin_width"))
        .select("hash_lo", "hash_hi", "distance", "bin_width", "bin", "n")
    )


NS_PER_MIN = 60 * 10**9


def pair_uptime(transitions: DataFrame, end_of_data_ts: int) -> DataFrame:
    """A7 meta: per-pair uptime in minutes — accumulated time during which
    BOTH stations of a pair were `reliable` (reference
    src/analysis/stationcoincidence.cpp:82-109: the online counter reaches 2
    only while both are reliable; minutes are truncated PER SEGMENT, matching
    the reference's duration_cast<minutes> at each segment close).

    transitions: (hash, ts, status, reason) — the station_lifecycle output
    (ts in ns). Stations are a dimension (thousands at most), so the
    interval-overlap self-join is dimension-sized, never data-sized: at
    100 TB the transition stream is still O(stations x status flips).

    Returns (hash_lo, hash_hi, uptime) with uptime in whole minutes.
    """
    # (ts, status) ordering matches the oracle's deterministic tie-break —
    # with ts alone, two same-instant transitions would get a
    # nondeterministic lead() order and interval ends could flap per run.
    w = Window.partitionBy("hash").orderBy("ts", "status")
    iv = (
        transitions.select("hash", "ts", "status", F.lead("ts").over(w).alias("ts_end"))
        .filter(F.col("status") == "reliable")
        .select(
            "hash",
            F.col("ts").alias("t0"),
            F.coalesce("ts_end", F.lit(end_of_data_ts)).alias("t1"),
        )
    )
    a = iv.select(F.col("hash").alias("hash_lo"), F.col("t0").alias("a0"), F.col("t1").alias("a1"))
    b = iv.select(F.col("hash").alias("hash_hi"), F.col("t0").alias("b0"), F.col("t1").alias("b1"))
    seg = (
        a.join(
            F.broadcast(b),
            (F.col("hash_lo") < F.col("hash_hi"))
            & (F.col("a0") < F.col("b1"))
            & (F.col("b0") < F.col("a1")),
        )
        # disjoint-per-station intervals make each intersection exactly one
        # online==2 stretch
        .select(
            "hash_lo",
            "hash_hi",
            (F.least("a1", "b1") - F.greatest("a0", "b0")).alias("overlap_ns"),
        )
    )
    return (
        seg.groupBy("hash_lo", "hash_hi")
        .agg(F.sum(F.expr(f"overlap_ns div {NS_PER_MIN}")).alias("uptime"))
        .select("hash_lo", "hash_hi", F.col("uptime").cast("long").alias("uptime"))
    )


def with_pair_meta(hist: DataFrame, uptime: DataFrame, sample_time_min: int) -> DataFrame:
    """Attach the reference's .meta bookkeeping to a histogram table:
    per-pair `uptime` (broadcast join on the pair key, 0 when the pair never
    had both stations reliable) and the save-window `sample_time` in minutes
    (stationcoincidence.cpp:190-193 writes both at every save)."""
    return (
        hist.join(F.broadcast(uptime), ["hash_lo", "hash_hi"], "left")
        .withColumn("uptime", F.coalesce(F.col("uptime"), F.lit(0)).cast("long"))
        .withColumn("sample_time", F.lit(sample_time_min).cast("long"))
    )


def merge_histograms_meta(*hists: DataFrame) -> DataFrame:
    """A9 offline merge INCLUDING meta accumulation (reference
    src/aggregation.cpp:154-176: `uptime` and `sample_time` are SUMMED
    across saved files, per pair). Bin counts merge per (pair, bin) as in
    merge_histograms; meta merges per pair (one value per input file, summed
    across files) and is re-joined — summing row-wise would overweight pairs
    whose bins appear in only some inputs."""
    metas = [
        h.groupBy("hash_lo", "hash_hi").agg(
            F.max("uptime").alias("uptime"), F.max("sample_time").alias("sample_time")
        )
        for h in hists
    ]
    it = iter(metas)
    meta_all = next(it)
    for m in it:
        meta_all = meta_all.unionByName(m)
    meta = meta_all.groupBy("hash_lo", "hash_hi").agg(
        F.sum("uptime").cast("long").alias("uptime"),
        F.sum("sample_time").cast("long").alias("sample_time"),
    )
    bins = merge_histograms(*[h.drop("uptime", "sample_time") for h in hists])
    return bins.join(F.broadcast(meta), ["hash_lo", "hash_hi"]).select(
        "hash_lo", "hash_hi", "distance", "bin_width", "uptime", "sample_time", "bin", "n"
    )


def load_histograms(spark, path: str) -> DataFrame:
    """Read a histogram store written by ``save_histograms`` across SCHEMA
    VINTAGES: saves from before the A7 meta landed carry no
    ``uptime``/``sample_time`` columns. ``mergeSchema`` unions the file
    schemas and this backfills the meta as 0 (the reference's aggregator
    treats an absent .meta line the same way — nothing is added to the
    sums, src/aggregation.cpp:154-176), so merge_histograms_meta works over
    mixed-vintage stores."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, default in (("uptime", 0), ("sample_time", 0)):
        if col not in df.columns:
            df = df.withColumn(col, F.lit(default).cast("long"))
        else:
            df = df.withColumn(col, F.coalesce(F.col(col).cast("long"), F.lit(default)))
    return df
