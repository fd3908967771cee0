"""Deterministic synthetic muon-network fixtures (FIXTURES.md group A)."""

from __future__ import annotations

import numpy as np

# Station layout around 47N 8E: pair distances span ~200 m ... >70 km
# (beyond the 62.3 km coincidence limit), per FIXTURES.md A2.
STATIONS = [
    # (hash, lat, lon, h)
    (1001, 47.0000, 8.0000, 450.0),
    (1002, 47.0020, 8.0000, 455.0),  # ~220 m north of 1001
    (1003, 47.0000, 8.0100, 460.0),  # ~760 m east of 1001
    (1004, 47.0900, 8.0000, 500.0),  # ~10 km
    (1005, 47.2500, 8.2000, 520.0),  # ~32 km
    (1006, 47.4500, 8.4000, 480.0),  # ~58 km from 1001
    (1007, 47.7000, 8.8000, 430.0),  # ~98 km from 1001 (beyond limit)
    (1008, 46.9500, 7.9000, 470.0),  # ~9.5 km southwest
]


def make_events(
    n_base: int = 2000,
    seed: int = 7,
    span_ns: int = 10**12,  # 1000 s
    coincidence_frac: float = 0.25,
):
    """Base events at random stations/times + injected near-coincident
    partners at other stations (dt spanning the score boundaries)."""
    rng = np.random.default_rng(seed)
    hashes = np.array([s[0] for s in STATIONS])
    rows = []
    eid = 0
    for _ in range(n_base):
        st = int(rng.integers(0, len(STATIONS)))
        start = int(rng.integers(0, span_ns))
        pulse = int(rng.integers(50, 500_000))
        rows.append(
            dict(
                hash=int(hashes[st]),
                start=start,
                end=start + pulse,
                time_acc=int(rng.integers(1, 900)),
                ublox_counter=eid % 65536,
                fix=1,
            )
        )
        eid += 1
        if rng.random() < coincidence_frac:
            # partner at a different station, dt from sub-tof to beyond-window
            st2 = int(rng.integers(0, len(STATIONS)))
            if st2 == st:
                st2 = (st2 + 1) % len(STATIONS)
            dt = int(rng.choice([50, 300, 2_000, 30_000, 150_000, 220_000, 500_000]))
            s2 = start + dt
            rows.append(
                dict(
                    hash=int(hashes[st2]),
                    start=s2,
                    end=s2 + int(rng.integers(50, 500_000)),
                    time_acc=int(rng.integers(1, 900)),
                    ublox_counter=eid % 65536,
                    fix=1,
                )
            )
            eid += 1
    return rows


def station_rows():
    return [dict(hash=h, lat=lat, lon=lon, h=hh) for (h, lat, lon, hh) in STATIONS]
