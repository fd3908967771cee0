"""Coincidence clustering: handcrafted semantic scenarios (golden model) +
golden-vs-Spark equivalence on randomized fixtures."""

from __future__ import annotations

import pytest

from detector_network_processor_spark.constants import MAX_TIME_NS
from detector_network_processor_spark.functions.geodesy import straight_distance_scalar
from detector_network_processor_spark.operators.coincidence import cluster_coincidences
from detector_network_processor_spark.operators.golden import (
    Hit,
    cluster_hits,
    compare_physics,
    groups_to_rows,
)

from muon_fixtures import STATIONS, make_events, station_rows

US = 1000  # ns per us

S1 = dict(lat=47.0000, lon=8.0000, h=450.0)
S2 = dict(lat=47.0000, lon=8.0132, h=450.0)  # ~1 km east of S1
S3 = dict(lat=47.4500, lon=8.0000, h=450.0)  # ~50 km north of S1/S2


def _hit(hash_, start, loc, end=None, **kw):
    return Hit(hash=hash_, start=start, end=end if end is not None else start + 100, **loc, **kw)


def _key(group_row):
    return tuple(sorted((e["hash"], e["start"]) for e in group_row["events"]))


def test_geometry_assumptions():
    d12 = straight_distance_scalar(S1["lat"], S1["lon"], S1["h"], S2["lat"], S2["lon"], S2["h"])
    d13 = straight_distance_scalar(S1["lat"], S1["lon"], S1["h"], S3["lat"], S3["lon"], S3["h"])
    assert 900 < d12 < 1100
    assert 45_000 < d13 < 55_000


def test_two_station_valid_pair():
    hits = [_hit(1, 0, S1), _hit(2, 1 * US, S2)]  # dt=1us, tof(1km)~3.3us
    rows = groups_to_rows(cluster_hits(hits))
    assert len(rows) == 1
    g = rows[0]
    assert g["n"] == 2 and g["true_e"] == 1 and g["conflicting"] is False
    assert g["start"] == 0 and g["end"] == 1 * US  # envelope over starts


def test_same_station_never_pairs_directly():
    hits = [_hit(1, 0, S1), _hit(1, 1 * US, S1)]
    rows = groups_to_rows(cluster_hits(hits))
    assert len(rows) == 2 and all(r["n"] == 1 for r in rows)


def test_beyond_hard_cutoff_is_invalid():
    hits = [_hit(1, 0, S1), _hit(2, int(MAX_TIME_NS) + 1000, S2)]
    rows = groups_to_rows(cluster_hits(hits))
    assert len(rows) == 2


def test_tof_floor_150ns():
    # Same coordinates -> distance 0 -> tof floored at 150 ns.
    near = dict(lat=S1["lat"], lon=S1["lon"], h=S1["h"])
    ok = cluster_hits([_hit(1, 0, S1), _hit(2, 100, near)])  # score 1-100/150 > 0
    bad = cluster_hits([_hit(1, 0, S1), _hit(2, 200, near)])  # score 1-200/150 < 0
    assert len(ok) == 1 and ok[0].n() == 2
    assert len(bad) == 2


def test_conflicting_fold_does_not_set_flag():
    """A Conflicting verdict on the FIRST fold must NOT set the flag
    (reference coincidencefilter.cpp:117-119 dead branch)."""
    # E1@S1 t=0; E3@S3 t=90us (valid: tof(50km)~167us); then E2@S2 t=180us:
    # vs {E1,E3}: pair E2-E1 = -1 (1 km, 180us), pair E2-E3 ~ 1-90/167 = 0.46
    # mean ~ -0.27 > -0.3 and not all positive -> Conflicting -> folds.
    hits = [_hit(1, 0, S1), _hit(3, 90 * US, S3), _hit(2, 180 * US, S2)]
    # sanity: the individual scores behind the scenario
    assert compare_physics(hits[2], hits[0]) == -1.0
    assert 0.3 < compare_physics(hits[2], hits[1]) < 0.6
    rows = groups_to_rows(cluster_hits(hits))
    assert len(rows) == 1
    g = rows[0]
    assert g["n"] == 3
    assert g["conflicting"] is False  # dead-branch semantics
    assert g["true_e"] == 2  # 1 (E1-E3 fold) + 1 (E2's one positive pair)


def test_transitive_merge_sets_conflicting():
    """E3 folds into G1={E1} then merges G2={E2} (coincidencefilter.cpp:124-139)."""
    # E1@S1 t=0, E2@S2 t=100us: invalid pair (1 km, 100us) -> two groups.
    # E3@S3 t=150us: vs E1: 1-150/167=0.10 valid; vs E2: 1-50/167=0.70 valid.
    hits = [_hit(1, 0, S1), _hit(2, 100 * US, S2), _hit(3, 150 * US, S3)]
    assert compare_physics(hits[1], hits[0]) == -1.0
    assert compare_physics(hits[2], hits[0]) > 0.0
    assert compare_physics(hits[2], hits[1]) > 0.0
    rows = groups_to_rows(cluster_hits(hits))
    assert len(rows) == 1
    g = rows[0]
    assert g["n"] == 3
    assert g["conflicting"] is True  # set by the merge
    assert g["true_e"] == 2
    assert g["start"] == 0 and g["end"] == 150 * US


def test_merge_can_reunite_same_station_hits():
    """Station-overlap exclusion applies to incoming-vs-group only; a merge
    can still land two same-station hits in one group (reference next_match
    checks the probe event, coincidencefilter.cpp:69-85)."""
    hits = [_hit(1, 0, S1), _hit(1, 1 * US, S1), _hit(2, int(1.5 * US), S2)]
    rows = groups_to_rows(cluster_hits(hits))
    assert len(rows) == 1
    g = rows[0]
    assert g["n"] == 3 and g["conflicting"] is True
    hashes = sorted(e["hash"] for e in g["events"])
    assert hashes == [1, 1, 2]


@pytest.mark.parametrize("criterion", ["physics", "simple"])
def test_spark_matches_golden_on_random_fixture(spark, criterion):
    events = make_events(n_base=1500, seed=11)
    stations = {s[0]: s for s in STATIONS}
    hits = [
        Hit(
            hash=e["hash"],
            start=e["start"],
            end=e["end"],
            lat=stations[e["hash"]][1],
            lon=stations[e["hash"]][2],
            h=stations[e["hash"]][3],
            time_acc=e["time_acc"],
            ublox_counter=e["ublox_counter"],
            fix=e["fix"],
        )
        for e in events
    ]
    from detector_network_processor_spark.operators.golden import compare_simple

    compare = compare_physics if criterion == "physics" else compare_simple
    golden = groups_to_rows(cluster_hits(hits, compare))

    ev_df = spark.createDataFrame(events)
    st_df = spark.createDataFrame(station_rows())
    got = cluster_coincidences(ev_df, st_df, criterion=criterion).collect()

    def canon(rows):
        out = {}
        for r in rows:
            r = r if isinstance(r, dict) else r.asDict(recursive=True)
            out[_key(r)] = (r["start"], r["end"], r["n"], r["conflicting"], r["true_e"])
        return out

    g, s = canon(golden), canon(got)
    assert len(golden) == len(got), f"group count: golden={len(golden)} spark={len(got)}"
    assert g == s

    # sanity: the fixture actually produced coincidences
    assert sum(1 for r in golden if r["n"] >= 2) > 50


@pytest.mark.parametrize("criterion", ["physics", "simple"])
def test_small_session_jvm_matches_golden(spark, criterion):
    """Randomized differential test of the closed-form 2/3/4-hit resolver
    (_resolve_small_jvm) against the golden replay — every branch of the
    enumeration (fold, group-verdict fold, transitive merge with its
    [e1,e3,e2] constituent order, same-station skips, singletons, and the
    r13 quad tier: 4-fold, group-absorbs-group merge, chain merge) gets
    traffic across 2400 random sessions."""
    import random

    from detector_network_processor_spark.operators.coincidence import _resolve_small_jvm
    from detector_network_processor_spark.operators.golden import compare_simple

    rng = random.Random(1234)
    rows = []
    base = 1_700_000_000_000_000_000
    for sid in range(2400):
        n_hits = rng.choice([2, 2, 3, 3, 3, 4, 4, 4, 4])
        stations = rng.sample(range(12), rng.randint(1, n_hits))
        t0 = base + sid * 10_000_000_000
        for _ in range(n_hits):
            st = rng.choice(stations)
            dt = rng.choice(
                [rng.randint(0, 500), rng.randint(0, 5000),
                 rng.randint(0, 250_000), rng.randint(0, 600_000)]
            )
            start = t0 + dt
            rows.append(
                dict(
                    session_id=sid, hash=st, start=start,
                    end=start + rng.randint(100, 400_000),
                    time_acc=rng.randint(0, 3000),
                    ublox_counter=rng.randint(0, 65535), fix=1,
                    lat=47.0 + (st % 4) * 0.12, lon=8.0 + (st // 4) * 0.15, h=450.0,
                )
            )

    compare = compare_physics if criterion == "physics" else compare_simple
    got = _resolve_small_jvm(spark.createDataFrame(rows), criterion).collect()
    got_by_sid: dict = {}
    for r in got:
        got_by_sid.setdefault(r.session_id, []).append(r)
    by_sid: dict = {}
    for r in rows:
        by_sid.setdefault(r["session_id"], []).append(r)

    def canon_g(g):
        return (g["start"], g["end"], g["n"], g["conflicting"], g["true_e"],
                tuple((e["hash"], e["start"], e["end"], e["time_acc"],
                       e["ublox_counter"], e["fix"]) for e in g["events"]))

    def canon_r(r):
        return (r.start, r.end, r.n, r.conflicting, r.true_e,
                tuple((e.hash, e.start, e.end, e.time_acc, e.ublox_counter, e.fix)
                      for e in r.events))

    merges = folds = 0
    quad_folds = quad_merges = quad_te3 = 0
    for sid, rs in by_sid.items():
        hits = [
            Hit(hash=r["hash"], start=r["start"], end=r["end"], time_acc=r["time_acc"],
                ublox_counter=r["ublox_counter"], fix=r["fix"],
                lat=r["lat"], lon=r["lon"], h=r["h"])
            for r in rs
        ]
        exp = groups_to_rows(cluster_hits(hits, compare))
        assert sorted(map(canon_g, exp)) == sorted(map(canon_r, got_by_sid.get(sid, []))), sid
        merges += sum(1 for g in exp if g["conflicting"])
        folds += sum(1 for g in exp if g["n"] == 3 and not g["conflicting"])
        quad_folds += sum(1 for g in exp if g["n"] == 4 and not g["conflicting"])
        quad_merges += sum(1 for g in exp if g["n"] == 4 and g["conflicting"])
        quad_te3 += sum(1 for g in exp if g["n"] == 4 and g["true_e"] >= 3)

    # the adversarial branches actually fired
    assert merges > 5 and folds >= 10
    # ...including the r13 quad tier: clean 4-folds, conflicting 4-merges,
    # and high-true_e chain merges
    assert quad_folds >= 5 and quad_merges >= 5 and quad_te3 >= 5


@pytest.mark.parametrize("criterion", ["physics", "simple"])
def test_matrix_scoring_matches_scalar_replay(criterion):
    """The dense-session matrix fast path (_matrix_compare) must reproduce
    the scalar golden replay bit-for-bit, including sessions far above
    the fixture's size range (a noise burst of n=60)."""
    import random

    from detector_network_processor_spark.operators.coincidence import (
        _matrix_compare,
        _session_rows_to_l1,
    )
    from detector_network_processor_spark.operators.golden import compare_simple

    compare = compare_physics if criterion == "physics" else compare_simple
    rng = random.Random(77)
    base = 1_700_000_000_000_000_000
    for n in (6, 9, 17, 60):
        for trial in range(8):
            stations = rng.sample(range(12), rng.randint(2, 6))
            hits = []
            t = base
            for _ in range(n):
                t += rng.choice([rng.randint(0, 2_000), rng.randint(0, 150_000)])
                st = rng.choice(stations)
                hits.append(
                    Hit(hash=st, start=t, end=t + 500, time_acc=10, ublox_counter=0,
                        fix=1, lat=47.0 + (st % 4) * 0.12, lon=8.0 + (st // 4) * 0.15,
                        h=450.0)
                )
            # scalar replay (golden), matrix replay (fast path) — identical
            want = groups_to_rows(cluster_hits(hits, compare))
            got = groups_to_rows(cluster_hits(hits, _matrix_compare(hits, compare)))
            assert want == got, (criterion, n, trial)
            # and the kernel entry point routes through the matrix path
            assert _session_rows_to_l1(1, hits, compare) == _session_rows_to_l1(
                1, hits, _matrix_compare(hits, compare)
            )
