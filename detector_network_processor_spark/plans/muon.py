"""Driver-visible muon-domain queries: the flagship L1 coincidence operator
run on a deterministic "muonization" of the events fixture.

The driver's fixtures carry no station geometry, so we derive a synthetic
detector network deterministically from the data (same rows every run, any
scale factor): user_id -> station on a lat/lon grid, event times remapped
onto a span proportional to the row count so session sizes stay bounded and
scale-invariant. No DuckDB oracle — the clustering semantics (transitive
merge, conflicting/true_e bookkeeping) are not SQL-expressible; correctness
is pinned by the golden-model tests in tests/test_coincidence.py instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table, table_row_count
from ..operators.coincidence import cluster_coincidences, l1_flatten
from . import register

_NS_PER_EVENT = 400_000  # mean gap ~2x the physics cutoff -> bounded sessions


def muonize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> muon hit stream (hash,start,end,...,lat,lon,h)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    # footer-metadata row count (cached, zero Spark jobs) — an eager
    # ev.count() here would run one extra job per muon-family query
    n = table_row_count(sf_dir, "events")
    span = n * _NS_PER_EVENT
    # Shifted-quadratic scatter: multiplicative (affine) maps of consecutive
    # ids produce only three distinct sorted gaps (three-distance theorem) —
    # one giant session. (id+1e6)^2 always wraps the modulus, giving
    # Poisson-like gaps (~60% singleton sessions, p99 size 6, max ~16,
    # scale-invariant) while staying exactly expressible in DuckDB SQL for
    # the oracle (no engine hash functions, no int64 overflow up to sf~1e3).
    mixed = (
        ((F.col("event_id") + 1_000_003) * (F.col("event_id") + 1_000_003)) % span * 31
        + F.col("event_id") * 48271
    ) % span
    base = ev.select(
        F.col("user_id").alias("station"),
        F.col("event_id"),
        mixed.alias("start"),
    )
    # Partner hits at a different station, dt in [0, 250 us) — half inside
    # the 207.9 us physics window (coincidences), half outside.
    partners = base.filter(F.col("event_id") % 7 == 0).select(
        ((F.col("station") + 3) % 15).alias("station"),
        (F.col("event_id") + 10_000_000).alias("event_id"),
        (F.col("start") + (F.col("event_id") * 131) % 250_000).alias("start"),
    )
    hits = base.unionByName(partners)
    # time_acc spans [0, 3000) so the F1 quality gate (<= 1000 ns) has real
    # pass/fail traffic; fix drops ~1% of rows.
    return hits.select(
        F.col("station").cast("long").alias("hash"),
        F.col("start"),
        (F.col("start") + 1000 + F.col("event_id") % 400_000).alias("end"),
        (F.col("event_id") % 3000).cast("int").alias("time_acc"),
        (F.col("event_id") % 65536).cast("int").alias("ublox_counter"),
        F.when(F.col("event_id") % 97 == 0, 0).otherwise(1).cast("int").alias("fix"),
        (47.0 + (F.col("station") % 4) * 0.12).alias("lat"),
        (8.0 + F.floor(F.col("station") / 4) * 0.15).alias("lon"),
        F.lit(450.0).alias("h"),
    )


@register(
    "l1_coincidence",
    oracle=None,
    doc="Flagship §2.5 operator: gap-session candidate generation + per-session exact replay kernel (conflicting/true_e/transitive-merge semantics, reference src/analysis/coincidencefilter.cpp:60-143). Output = K1 sink projection, one row per constituent of each n>=2 group.",
)
def l1_coincidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir)
    l1 = cluster_coincidences(hits, stations=None, criterion="physics")
    return l1_flatten(l1, min_n=2)


def _station_events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> per-station hit stream in exact int64 microseconds
    (real 30-day cadence — used by the lifecycle/summary operators whose
    timers live at the 90 s .. 48 h scale)."""
    ev = load_table(spark, sf_dir, "events")
    start = F.expr("ts div 1000")
    return ev.select(
        F.col("user_id").alias("hash"),
        start.alias("start"),
        (start + F.col("event_id") % 400_000).alias("end"),
        (F.col("event_id") % 2000).cast("long").alias("time_acc"),
        (F.col("event_id") % 65536).cast("long").alias("ublox_counter"),
        F.lit(1).cast("long").alias("fix"),
        F.col("event_id"),
    )


@register(
    "detector_summary",
    oracle="""
WITH ev AS (
  SELECT user_id AS hash, epoch_us(ts) AS start,
         epoch_us(ts) + event_id % 400000 AS e_end,
         event_id % 2000 AS time_acc, event_id % 65536 AS ublox
  FROM events
), d AS (
  SELECT *, lag(ublox) OVER (PARTITION BY hash ORDER BY start, ublox, e_end) AS prev FROM ev
), e AS (
  SELECT hash, start // 120000000 AS win, start // 30000000 AS sub,
         CASE WHEN prev IS NULL THEN 0
              WHEN ublox <= prev THEN ublox + (65535 - prev)
              ELSE ublox - prev END AS delta,
         e_end - start AS pulse, time_acc
  FROM d
), per_sub AS (
  SELECT hash, win, sub, count(*) AS c FROM e GROUP BY hash, win, sub
), rate AS (
  SELECT hash, win,
         round(sum(c) / 4.0, 6) AS rate_mean,
         round(sqrt(sum(c * c) / 4.0 - (sum(c) / 4.0) * (sum(c) / 4.0)), 6) AS rate_std
  FROM per_sub GROUP BY hash, win
), base AS (
  SELECT hash, win, count(*) AS incoming, CAST(sum(delta) AS BIGINT) AS ublox_counter_progress,
         round(avg(CASE WHEN pulse > 0 AND pulse < 1000000 THEN pulse END), 6) AS mean_pulselength,
         round(avg(time_acc), 6) AS mean_time_acc
  FROM e GROUP BY hash, win
)
SELECT base.hash, base.win, incoming, ublox_counter_progress,
       CASE WHEN ublox_counter_progress = 0 THEN 1.0
            ELSE round(1.0 - incoming / ublox_counter_progress, 6) END AS deadtime,
       mean_pulselength, mean_time_acc, rate_mean, rate_std
FROM base JOIN rate ON base.hash = rate.hash AND base.win = rate.win
ORDER BY base.hash, base.win
""",
    doc="A5 detector summary snapshot (reference src/supervision/station.cpp:89-102): per-station tumbling-interval incoming/wrap-corrected counter progress/deadtime/pulse-length/time-accuracy/rate stats.",
)
def detector_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.station import detector_summaries

    ev = _station_events_us(spark, sf_dir).drop("event_id", "fix")
    out = detector_summaries(ev, interval=120_000_000, sub_interval=30_000_000)
    return out.orderBy("hash", "win")


@register(
    "station_lifecycle",
    oracle=None,
    doc="§2.8 per-station lifecycle state machine batch replay (reference src/analysis/detectorstation.cpp:89-135): created/reliable/unreliable/offline/deleted transitions with 90s/270s/48h event-time timers and +-15% hysteresis. applyInPandas keyed by station; golden-tested in tests/test_station.py.",
)
def station_lifecycle_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.station import station_lifecycle

    ev_us = _station_events_us(spark, sf_dir)
    # ns timeline for the state machine (timers are in seconds..hours)
    events = ev_us.select(
        "hash",
        (F.col("start") * 1000).alias("start"),
        (F.col("end") * 1000).alias("end"),
        "time_acc",
        "ublox_counter",
        "fix",
    )
    # every 5th event doubles as a detector_info log; location quality
    # straddles the 299.79 m reliability limit so hysteresis is exercised
    logs = ev_us.filter(F.col("event_id") % 5 == 0).select(
        "hash",
        (F.col("start") * 1000).alias("ts"),
        (1.0 + (F.col("event_id") % 40) / 10.0).alias("dop"),
        (30.0 + (F.col("event_id") % 200)).alias("h_acc"),
        F.lit(40.0).alias("v_acc"),
    )
    return station_lifecycle(logs, events)


@register(
    "timebase_calibration",
    oracle="""
WITH ev AS (SELECT user_id, epoch_us(ts) * 1000 AS start FROM events),
b AS (SELECT start // 2000000000 AS bucket, start FROM ev)
SELECT bucket, max(start) - min(start) AS span_ns, count(*) AS n_events,
       greatest(800000000, least(120000000000, max(start) - min(start))) AS timebase_ns
FROM b GROUP BY bucket
ORDER BY bucket
""",
    doc="W1 adaptive timebase batch calibration (reference src/supervision/timebase.cpp:17-45): observed event-time span per 2 s sample, clamped to [800 ms, 2 min].",
)
def timebase_calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timebase import timebase_calibration

    ev = _station_events_us(spark, sf_dir).select((F.col("start") * 1000).alias("start"))
    return timebase_calibration(ev).orderBy("bucket")


@register(
    "rate_factor",
    oracle="""
WITH ev AS (SELECT user_id AS hash, epoch_us(ts) * 1000 AS start FROM events),
counts AS (
  SELECT hash, start // 30000000000 AS ivl, count(*) AS c FROM ev GROUP BY hash, ivl
), win AS (
  SELECT hash, ivl, c,
         avg(c) OVER w AS mean_c,
         sqrt(avg(c * c) OVER w - avg(c) OVER w * avg(c) OVER w) AS sigma_c
  FROM counts
  WINDOW w AS (PARTITION BY hash ORDER BY ivl ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT hash, ivl, c AS n_events,
       round(mean_c, 6) AS mean_rate, round(sigma_c, 6) AS sigma_rate,
       round(CASE WHEN sigma_c > 0 AND c < mean_c - sigma_c
                  THEN ((mean_c - c) / sigma_c + 1.0) * 2.0 ELSE 1.0 END, 6) AS factor
FROM win
ORDER BY hash, ivl
""",
    doc="W2 adaptive slowdown factor (reference src/analysis/detectorstation.cpp:127-135): rate-dip test over trailing 10 intervals, ((mean-cur)/sigma+1)*2.",
)
def rate_factor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timebase import rate_factor

    ev = _station_events_us(spark, sf_dir).select("hash", (F.col("start") * 1000).alias("start"))
    return rate_factor(ev).orderBy("hash", "ivl")


@register(
    "adaptive_timeout",
    oracle="""
WITH ev AS (SELECT user_id AS hash, epoch_us(ts) * 1000 AS start FROM events),
counts AS (SELECT hash, start // 30000000000 AS ivl, count(*) AS c FROM ev GROUP BY hash, ivl),
win AS (
  SELECT hash, ivl, c, avg(c) OVER w AS mean_c,
         sqrt(avg(c * c) OVER w - avg(c) OVER w * avg(c) OVER w) AS sigma_c
  FROM counts
  WINDOW w AS (PARTITION BY hash ORDER BY ivl ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
), factors AS (
  SELECT ivl, max(CASE WHEN sigma_c > 0 AND c < mean_c - sigma_c
                       THEN ((mean_c - c) / sigma_c + 1.0) * 2.0 ELSE 1.0 END) AS max_factor
  FROM win GROUP BY ivl
), spans AS (
  SELECT start // 30000000000 AS ivl,
         greatest(800000000, least(120000000000, max(start) - min(start))) AS timebase_ns
  FROM ev GROUP BY ivl
)
SELECT spans.ivl AS ivl, timebase_ns, round(max_factor, 6) AS max_factor,
       greatest(2000000000, least(1800000000000, CAST(trunc(timebase_ns * max_factor) AS BIGINT))) AS timeout_ns
FROM spans JOIN factors ON spans.ivl = factors.ivl
ORDER BY spans.ivl
""",
    doc="W1+W2+W3 composition (reference src/supervision/station.cpp:65-82, src/messages/event.cpp:7-11): cluster-wide max factor x timebase, clamped to [2 s, 30 min] group timeout.",
)
def adaptive_timeout_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timebase import TIMEBASE_MAX_NS, TIMEBASE_MIN_NS, group_timeout, rate_factor

    ev = _station_events_us(spark, sf_dir).select("hash", (F.col("start") * 1000).alias("start"))
    factors = (
        rate_factor(ev)
        .groupBy("ivl")
        .agg(F.round(F.max("factor"), 6).alias("max_factor"))
    )
    spans = (
        ev.withColumn("ivl", F.expr("start div 30000000000"))
        .groupBy("ivl")
        .agg(
            F.greatest(
                F.lit(TIMEBASE_MIN_NS), F.least(F.lit(TIMEBASE_MAX_NS), F.max("start") - F.min("start"))
            ).alias("timebase_ns")
        )
    )
    return (
        spans.join(factors, "ivl")
        .select("ivl", "timebase_ns", "max_factor", group_timeout(F.col("timebase_ns"), F.col("max_factor")).alias("timeout_ns"))
        .orderBy("ivl")
    )


@register(
    "quality_filter",
    oracle="""
WITH raw AS (
  SELECT user_id AS hash, event_id FROM events
  UNION ALL
  SELECT (user_id + 3) % 15 AS hash, event_id + 10000000 AS event_id
  FROM events WHERE event_id % 7 = 0
),
ev AS (
  SELECT hash, event_id % 3000 AS time_acc,
         CASE WHEN event_id % 97 = 0 THEN 0 ELSE 1 END AS fix
  FROM raw
)
SELECT hash,
       count(*) AS incoming,
       CAST(sum(CASE WHEN time_acc <= 1000 AND fix = 1 THEN 1 ELSE 0 END) AS BIGINT) AS accepted,
       CAST(sum(CASE WHEN time_acc > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS extreme
FROM ev GROUP BY hash
ORDER BY hash
""",
    doc="F1 event quality gate accounting (reference src/analysis/detectorstation.cpp:31-62): accept iff time_acc <= 1 us and fix = 1; extreme counter for the unreliable side effect.",
)
def quality_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir)
    return (
        hits.groupBy("hash")
        .agg(
            F.count(F.lit(1)).alias("incoming"),
            F.sum(F.when((F.col("time_acc") <= 1000) & (F.col("fix") == 1), 1).otherwise(0)).alias("accepted"),
            F.sum(F.when(F.col("time_acc") > 100_000, 1).otherwise(0)).alias("extreme"),
        )
        .orderBy("hash")
    )


@register(
    "main_path_l1",
    oracle=None,
    doc="§3.1 main path composition: F1 quality gate -> physics coincidence clustering -> F4 n>=2 filter -> K1 flatten (reference src/application.cpp:188-197 wiring). Rows-only; each stage is oracle- or golden-checked individually.",
)
def main_path_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir).filter(
        (F.col("time_acc") <= 1000) & (F.col("fix") == 1)
    )
    l1 = cluster_coincidences(hits, stations=None, criterion="physics")
    return l1_flatten(l1, min_n=2)


def _ecef_sql(lat: str, lon: str, h: str) -> tuple[str, str, str]:
    """WGS84 geodetic->ECEF as SQL text (same constants as constants.py,
    inlined at full double precision so both engines fold identical
    literals)."""
    from ..constants import WGS84_A, WGS84_E2

    n = f"({WGS84_A!r} / sqrt(1.0 - {WGS84_E2!r} * sin(radians({lat})) * sin(radians({lat}))))"
    x = f"(({n} + {h}) * cos(radians({lat})) * cos(radians({lon})))"
    y = f"(({n} + {h}) * cos(radians({lat})) * sin(radians({lon})))"
    z = f"(({n} * {1.0 - WGS84_E2!r} + {h}) * sin(radians({lat})))"
    return x, y, z


def _pair_tof_histogram_oracle() -> str:
    from ..constants import C_M_PER_NS, MAX_TIME_NS

    xa, ya, za = _ecef_sql("lat_a", "lon_a", "h_a")
    xb, yb, zb = _ecef_sql("lat_b", "lon_b", "h_b")
    max_dt = int(MAX_TIME_NS)
    return f"""
WITH n AS (SELECT count(*) AS cnt FROM events),
raw AS (
  SELECT user_id AS hash,
         (((event_id + 1000003) * (event_id + 1000003)) % ((SELECT cnt FROM n) * 400000) * 31
          + event_id * 48271) % ((SELECT cnt FROM n) * 400000) AS start
  FROM events
  UNION ALL
  SELECT (user_id + 3) % 15 AS hash,
         (((event_id + 1000003) * (event_id + 1000003)) % ((SELECT cnt FROM n) * 400000) * 31
          + event_id * 48271) % ((SELECT cnt FROM n) * 400000) + (event_id * 131) % 250000 AS start
  FROM events WHERE event_id % 7 = 0
),
hits AS (
  SELECT hash, start,
         47.0 + (hash % 4) * 0.12 AS lat,
         8.0 + (hash // 4) * 0.15 AS lon,
         450.0 AS h
  FROM raw
),
pairs AS (
  SELECT a.hash AS hash_lo, b.hash AS hash_hi,
         a.start - b.start AS dt,
         a.lat AS lat_a, a.lon AS lon_a, a.h AS h_a,
         b.lat AS lat_b, b.lon AS lon_b, b.h AS h_b
  FROM hits a JOIN hits b
    ON a.hash < b.hash AND abs(a.start - b.start) <= {max_dt}
),
scored AS (
  SELECT hash_lo, hash_hi, dt,
         sqrt( ({xa}-{xb})*({xa}-{xb}) + ({ya}-{yb})*({ya}-{yb}) + ({za}-{zb})*({za}-{zb}) ) AS dist
  FROM pairs
),
binned AS (
  SELECT hash_lo, hash_hi, round(dist, 3) AS distance,
         CAST(trunc(greatest(1.0, least(100.0, 2.0 * (dist / {C_M_PER_NS!r}) / 2000.0))) AS INTEGER) AS bin_width,
         dt
  FROM scored
)
SELECT hash_lo, hash_hi, bin, count(*) AS n, min(distance) AS distance, min(bin_width) AS bin_width
FROM (SELECT *, CAST(floor((dt + bin_width * 1000) / bin_width) AS BIGINT) AS bin FROM binned)
WHERE bin >= 0 AND bin < 2000
GROUP BY hash_lo, hash_hi, bin
ORDER BY hash_lo, hash_hi, bin
"""


@register(
    "pair_tof_histogram",
    oracle=_pair_tof_histogram_oracle(),
    doc="A7 per-pair variable-width Δt histogram (reference src/analysis/stationcoincidence.cpp:224-240): bin width = clamp(2*tof/2000, 1, 100) ns from the WGS84 straight-line pair distance; Δt signed lower-hash minus higher-hash. Spark side = bucketed band join + broadcast station dim; oracle = full ECEF math in SQL.",
)
def pair_tof_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..constants import MAX_TIME_NS
    from ..operators.histogram import MAX_BIN_WIDTH_NS, N_BINS, bin_width_expr
    from ..functions.geodesy import straight_distance_col

    hits = muonize_events(spark, sf_dir).select("hash", "start", "lat", "lon", "h")
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


@register(
    "l1_pair_histogram",
    oracle=None,
    doc="A7 on true clustered output: constituent pairs of each n>=2 coincidence, per-pair variable-width bins (reference src/analysis/stationcoincidence.cpp:43-80). Rows-only: upstream clustering is not SQL-expressible.",
)
def l1_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.histogram import pair_dt_histogram

    hits = muonize_events(spark, sf_dir)
    stations = hits.select("hash", "lat", "lon", "h").distinct()
    l1 = cluster_coincidences(hits, stations=None, criterion="physics")
    return pair_dt_histogram(l1, stations)


def _geohash_sql(lat: str, lon: str, precision: int) -> str:
    """Geohash in portable SQL — same integer formulation as
    functions.geodesy.geohash_col."""
    base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    total = precision * 5
    nlon = (total + 1) // 2
    nlat = total // 2
    lon_q = f"least({(1 << nlon) - 1}, CAST(floor(({lon} + 180.0) / 360.0 * {1 << nlon}) AS BIGINT))"
    lat_q = f"least({(1 << nlat) - 1}, CAST(floor(({lat} + 90.0) / 180.0 * {1 << nlat}) AS BIGINT))"

    def bit(k: int) -> str:
        if k % 2 == 0:
            return f"(({lon_q} >> {nlon - 1 - k // 2}) & 1)"
        return f"(({lat_q} >> {nlat - 1 - k // 2}) & 1)"

    chars = []
    for c in range(precision):
        idx = " + ".join(f"{bit(c * 5 + j)} * {1 << (4 - j)}" for j in range(5))
        chars.append(f"substr('{base32}', CAST(({idx}) + 1 AS INTEGER), 1)")
    return " || ".join(chars)


@register(
    "station_geohash",
    oracle=f"""
WITH stations AS (
  SELECT DISTINCT user_id AS hash,
         47.0 + (user_id % 4) * 0.12 AS lat,
         8.0 + (user_id // 4) * 0.15 AS lon
  FROM events
)
SELECT hash, {_geohash_sql("lat", "lon", 6)} AS geohash,
       substr({_geohash_sql("lat", "lon", 6)}, 1, 3) AS geohash_anon
FROM stations ORDER BY hash
""",
    doc="F5 anonymization projection (reference include/sink/mqtt.h:156-158): geohash encode + truncate to max_geohash_length — flat JVM bit arithmetic, no UDF; oracle carries the identical integer formulation in SQL.",
)
def station_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geodesy import geohash_col

    st = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("hash"))
        .distinct()
        .select(
            "hash",
            (47.0 + (F.col("hash") % 4) * 0.12).alias("lat"),
            (8.0 + F.floor(F.col("hash") / 4) * 0.15).alias("lon"),
        )
    )
    gh = geohash_col(F.col("lat"), F.col("lon"), 6)
    return st.select(
        "hash", gh.alias("geohash"), F.substring(gh, 1, 3).alias("geohash_anon")
    ).orderBy("hash")


@register(
    "cluster_log",
    oracle=None,
    doc="A6 cluster health log (reference src/supervision/state.cpp:106-136, include/messages/clusterlog.h:12-32): per 10s window — single_in/l1_out frequencies, outgoing count-by-multiplicity map, running max_n, mean plausibility (true_e / (n(n-1)/2)) of L1 events. cpu/mem live in streaming/monitor.py::ClusterLogListener, outside the data plane. Rows-only: clustering upstream.",
)
def cluster_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir)
    l1 = cluster_coincidences(hits, stations=None, criterion="physics").localCheckpoint(eager=False)
    win = F.expr("start div 10000000000")  # 10 s of muonized time
    max_edges = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    base = l1.select(
        win.alias("window"),
        "n",
        F.when(F.col("n") >= 2, F.col("true_e") / max_edges).alias("plausibility"),
    )
    stats = base.groupBy("window").agg(
        F.sum("n").alias("single_in"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("l1_out"),
        F.max("n").alias("max_n"),
        F.round(F.avg("plausibility"), 6).alias("mean_plausibility"),
    )
    # outgoing: count-by-coincidence-level map (clusterlog.h:21), emitted as a
    # deterministic JSON string (sorted by n) — scalar column so every
    # comparator (driver canon included) can sort/hash it.
    outgoing = (
        base.groupBy("window", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("window")
        .agg(
            F.to_json(
                F.sort_array(F.collect_list(F.struct("n", "cnt")))
            ).alias("outgoing")
        )
    )
    return (
        stats.join(outgoing, "window")
        .withColumn("in_rate_hz", F.round(F.col("single_in") / 10.0, 6))
        .withColumn("out_rate_hz", F.round(F.col("l1_out") / 10.0, 6))
        .orderBy("window")
    )


def _muonize_hits_sql() -> str:
    """DuckDB mirror of muonize_events (hash, start, e_end, time_acc, fix) —
    shared CTE text for the flagship-adjacent oracles."""
    return """
nn AS (SELECT count(*) AS cnt FROM events),
raw AS (
  SELECT user_id AS hash, event_id,
         (((event_id + 1000003) * (event_id + 1000003)) % ((SELECT cnt FROM nn) * 400000) * 31
          + event_id * 48271) % ((SELECT cnt FROM nn) * 400000) AS start
  FROM events
  UNION ALL
  SELECT (user_id + 3) % 15 AS hash, event_id + 10000000 AS event_id,
         (((event_id + 1000003) * (event_id + 1000003)) % ((SELECT cnt FROM nn) * 400000) * 31
          + event_id * 48271) % ((SELECT cnt FROM nn) * 400000) + (event_id * 131) % 250000 AS start
  FROM events WHERE event_id % 7 = 0
),
hits AS (
  SELECT hash, start, start + 1000 + event_id % 400000 AS e_end,
         event_id % 3000 AS time_acc,
         CASE WHEN event_id % 97 = 0 THEN 0 ELSE 1 END AS fix
  FROM raw
)"""


def _session_gap_ns() -> int:
    import math

    from ..constants import MAX_TIME_NS

    return int(math.ceil(MAX_TIME_NS))


@register(
    "l1_candidate_sessions",
    oracle=f"""
WITH {_muonize_hits_sql()},
brk AS (
  SELECT start, CASE WHEN start - lag(start) OVER (ORDER BY start) > {_session_gap_ns()}
                THEN 1 ELSE 0 END AS b
  FROM hits
),
sess AS (
  SELECT start, sum(b) OVER (ORDER BY start ROWS UNBOUNDED PRECEDING) AS sid FROM brk
)
SELECT min(start) AS session_start,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(count(*) AS BIGINT) AS session_n,
       max(start) - min(start) AS span_ns
FROM sess GROUP BY sid
ORDER BY session_start
""",
    doc="Candidate-generation phase of the §2.5 flagship operator, driver-adjudicated: the distributed range-sort sessionizer (operators/sessionize.py — one full shuffle, O(#partitions) boundary union-find) against a global-window SQL sessionization. session_n doubles as a check of the operator's boundary size-fix path.",
)
def l1_candidate_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize_global_gap

    hits = muonize_events(spark, sf_dir)
    sess = sessionize_global_gap(hits, "start", _session_gap_ns())
    return (
        sess.groupBy("session_id")
        .agg(
            F.min("start").alias("session_start"),
            F.count(F.lit(1)).alias("n_hits"),
            F.min("session_n").alias("session_n"),
            (F.max("start") - F.min("start")).alias("span_ns"),
        )
        .drop("session_id")
        .orderBy("session_start")
    )


@register(
    "l1_invariants",
    oracle=f"""
WITH {_muonize_hits_sql()}
SELECT CAST(count(*) AS BIGINT) AS total_constituents,
       min(start) AS min_group_start,
       CAST(sum(CASE WHEN time_acc <= 1000 AND fix = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS mainpath_constituents
FROM hits
""",
    doc="Driver-adjudicated mass-balance invariants of the flagship clustering (reference src/analysis/coincidencefilter.cpp:94-143): every hit lands in exactly one group, so sum(n) over all groups equals the input count (and the F1-gated main path's sum(n) equals the post-gate count); the group envelope floor equals the earliest hit. A dropped/duplicated event in the sessionize->kernel pipeline breaks the hash match.",
)
def l1_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir)
    l1 = cluster_coincidences(hits, stations=None, criterion="physics")
    gated = hits.filter((F.col("time_acc") <= 1000) & (F.col("fix") == 1))
    l1_main = cluster_coincidences(gated, stations=None, criterion="physics")
    a = l1.agg(
        F.sum("n").cast("long").alias("total_constituents"),
        F.min("start").alias("min_group_start"),
    )
    b = l1_main.agg(F.sum("n").cast("long").alias("mainpath_constituents"))
    return a.crossJoin(b)


@register(
    "l1_multiplicity_histogram",
    oracle=None,
    doc="A6 'outgoing' count-by-coincidence-level map (reference include/messages/clusterlog.h:21): histogram of L1 multiplicities.",
)
def l1_multiplicity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir)
    l1 = cluster_coincidences(hits, stations=None, criterion="physics")
    return l1.groupBy("n").agg(F.count(F.lit(1)).alias("n_groups")).orderBy("n")
