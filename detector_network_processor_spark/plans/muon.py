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

from ..io import load_table
from ..operators.coincidence import cluster_coincidences, l1_flatten
from . import register

_NS_PER_EVENT = 400_000  # mean gap ~2x the physics cutoff -> bounded sessions


def muonize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> muon hit stream (hash,start,end,...,lat,lon,h)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    n = ev.count()
    span = n * _NS_PER_EVENT
    # Knuth multiplicative scatter: the multiplier must exceed the span so
    # successive ids wrap and land pseudo-uniformly (a small multiplier
    # yields evenly-spaced starts => one giant session).
    base = ev.select(
        F.col("user_id").alias("station"),
        F.col("event_id"),
        ((F.col("event_id") * 2654435761) % span).alias("start"),
    )
    # Partner hits at a different station, dt in [0, 250 us) — half inside
    # the 207.9 us physics window (coincidences), half outside.
    partners = base.filter(F.col("event_id") % 7 == 0).select(
        ((F.col("station") + 3) % 15).alias("station"),
        (F.col("event_id") + 10_000_000).alias("event_id"),
        (F.col("start") + (F.col("event_id") * 131) % 250_000).alias("start"),
    )
    hits = base.unionByName(partners)
    return hits.select(
        F.col("station").cast("long").alias("hash"),
        F.col("start"),
        (F.col("start") + 1000 + F.col("event_id") % 400_000).alias("end"),
        (F.col("event_id") % 900).cast("int").alias("time_acc"),
        (F.col("event_id") % 65536).cast("int").alias("ublox_counter"),
        F.lit(1).cast("int").alias("fix"),
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


@register(
    "l1_multiplicity_histogram",
    oracle=None,
    doc="A6 'outgoing' count-by-coincidence-level map (reference include/messages/clusterlog.h:21): histogram of L1 multiplicities.",
)
def l1_multiplicity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = muonize_events(spark, sf_dir)
    l1 = cluster_coincidences(hits, stations=None, criterion="physics")
    return l1.groupBy("n").agg(F.count(F.lit(1)).alias("n_groups")).orderBy("n")
