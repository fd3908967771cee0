"""Property-based tests (hypothesis) for the pure-Python golden clustering
model (operators/golden.py) — the semantic anchor every Spark path is
differentially tested against. Pure Python, no SparkSession: hundreds of
randomized examples per run with shrinking.

Invariants checked (reference src/analysis/coincidencefilter.cpp:94-143):
- mass balance: every hit lands in exactly one group
- group envelope: start = min constituent start, end = max constituent
  start (groups) / the hit's own (start, end) for singletons
- same-station exclusion: no n>=2 group under the simple criterion holds
  two hits of the same station unless a conflicting transitive merge
  united them
- window soundness: consecutive constituent starts within a group can
  never exceed the criterion's hard time cutoff
- determinism: replay of the identical input is identical
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from detector_network_processor_spark.constants import MAX_TIME_NS, SIMPLE_WINDOW_NS
from detector_network_processor_spark.operators.golden import (
    Hit,
    cluster_hits,
    compare_physics,
    compare_simple,
)

# A handful of station sites ~10-40 km apart (inside the physics horizon)
_SITES = [
    (0, 47.00, 8.00, 450.0),
    (1, 47.10, 8.05, 455.0),
    (2, 47.05, 8.20, 440.0),
    (3, 47.20, 8.10, 460.0),
    (4, 46.95, 8.15, 445.0),
]


@st.composite
def hit_streams(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    hits = []
    t = 0
    for _ in range(n):
        # mixture of sub-window and super-window gaps exercises both the
        # fold and the session-break paths
        t += draw(
            st.one_of(
                st.integers(min_value=0, max_value=150_000),          # clusterable
                st.integers(min_value=250_000, max_value=2_000_000),  # breaks window
            )
        )
        site = draw(st.sampled_from(_SITES))
        hits.append(
            Hit(
                hash=site[0],
                start=t,
                end=t + draw(st.integers(min_value=1, max_value=400_000)),
                lat=site[1],
                lon=site[2],
                h=site[3],
            )
        )
    return hits


def _constituent_starts(groups):
    return sorted(
        (h.hash, h.start) for g in groups for h in g.constituents()
    )


@settings(max_examples=200, deadline=None)
@given(hit_streams(), st.sampled_from(["physics", "simple"]))
def test_mass_balance_and_envelope(hits, crit):
    compare = compare_physics if crit == "physics" else compare_simple
    groups = cluster_hits(hits, compare)
    # every input hit appears exactly once across all groups
    assert _constituent_starts(groups) == sorted((h.hash, h.start) for h in hits)
    for g in groups:
        cons = g.constituents()
        if g.n() >= 2:
            assert g.start == min(h.start for h in cons)
            assert g.end == max(h.start for h in cons)
            assert g.true_e >= 1
        else:
            assert g.start == cons[0].start
            assert g.end == cons[0].end
            assert g.true_e == 0 and not g.conflicting


@settings(max_examples=200, deadline=None)
@given(hit_streams(), st.sampled_from(["physics", "simple"]))
def test_window_soundness(hits, crit):
    """Sorted constituent starts inside one group never jump by more than
    the criterion's hard cutoff (a pair beyond it scores Invalid, so the
    chain could only have been joined through in-window neighbors)."""
    compare = compare_physics if crit == "physics" else compare_simple
    cutoff = MAX_TIME_NS if crit == "physics" else SIMPLE_WINDOW_NS
    for g in cluster_hits(hits, compare):
        starts = sorted(h.start for h in g.constituents())
        for a, b in zip(starts, starts[1:]):
            assert b - a <= cutoff


@settings(max_examples=200, deadline=None)
@given(hit_streams())
def test_same_station_pairs_only_via_conflicting_merge(hits):
    """F6: a group holding two hits of one station can only arise through
    a transitive merge, which always sets `conflicting` (the direct fold
    path refuses same-station overlap)."""
    for g in cluster_hits(hits, compare_simple):
        stations = [h.hash for h in g.constituents()]
        if len(stations) != len(set(stations)):
            assert g.conflicting, "same-station group without conflicting flag"


@settings(max_examples=50, deadline=None)
@given(hit_streams())
def test_replay_is_deterministic(hits):
    a = cluster_hits(list(hits), compare_physics)
    b = cluster_hits(list(hits), compare_physics)
    assert [(g.start, g.end, g.n(), g.conflicting, g.true_e) for g in a] == [
        (g.start, g.end, g.n(), g.conflicting, g.true_e) for g in b
    ]
