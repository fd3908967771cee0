"""Pair Δt histograms: reference-exact binning and the A9 offline merge."""

from __future__ import annotations

import math

from detector_network_processor_spark.constants import C_M_PER_NS
from detector_network_processor_spark.functions.geodesy import straight_distance_scalar
from detector_network_processor_spark.operators.coincidence import cluster_coincidences
from detector_network_processor_spark.operators.histogram import (
    merge_histograms,
    pair_dt_histogram,
    pair_totals,
)

from muon_fixtures import STATIONS, make_events, station_rows


def _hist(spark, seed):
    events = make_events(n_base=600, seed=seed)
    stations = {s[0]: s for s in STATIONS}
    enriched = [
        {**e, "lat": stations[e["hash"]][1], "lon": stations[e["hash"]][2], "h": stations[e["hash"]][3]}
        for e in events
    ]
    l1 = cluster_coincidences(spark.createDataFrame(enriched), criterion="physics")
    st_df = spark.createDataFrame(station_rows())
    return pair_dt_histogram(l1, st_df)


def test_bin_width_matches_reference_formula(spark):
    rows = _hist(spark, seed=31).collect()
    assert rows, "fixture produced no coincidences"
    stations = {s[0]: s for s in STATIONS}
    for r in rows:
        a, b = stations[r.hash_lo], stations[r.hash_hi]
        dist = straight_distance_scalar(a[1], a[2], a[3], b[1], b[2], b[3])
        tof = dist / C_M_PER_NS
        expected_w = int(min(max(2.0 * tof / 2000.0, 1.0), 100.0))
        assert r.bin_width == expected_w, (r.hash_lo, r.hash_hi)
        assert 0 <= r.bin < 2000
        assert abs(r.distance - round(dist, 3)) < 1e-9


def test_merge_histograms_sums_counts(spark):
    h1, h2 = _hist(spark, seed=31), _hist(spark, seed=32)
    merged = merge_histograms(h1, h2)
    t1 = {(r.hash_lo, r.hash_hi): r.total for r in pair_totals(h1).collect()}
    t2 = {(r.hash_lo, r.hash_hi): r.total for r in pair_totals(h2).collect()}
    tm = {(r.hash_lo, r.hash_hi): r.total for r in pair_totals(merged).collect()}
    for k in set(t1) | set(t2):
        assert tm[k] == t1.get(k, 0) + t2.get(k, 0)
