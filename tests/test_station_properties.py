"""Property-based tests (hypothesis) for the station lifecycle golden model
(operators/station_golden.py) — pure Python, no Spark session.

Invariants (reference src/analysis/detectorstation.cpp:18-135,
src/supervision/station.cpp:30-118):
- transitions are event-time monotone and only use the published vocabulary
- a station's first transition is always "online" (created by its first
  log); events before any log produce nothing
- consecutive transitions always change the status
- any "deleted" transition is preceded (<= same ts) by an "offline" one —
  the timer chain cannot skip states even across one giant gap
- chunked replay with carried state is EXACTLY the single-shot replay (the
  invariant the streaming applyInPandasWithState path relies on)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from detector_network_processor_spark.operators.station_golden import (
    STATUS_NAMES,
    replay_records,
    replay_station,
)

NS = 1_000_000_000


@st.composite
def record_streams(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    records = []
    t = 1_700_000_000 * NS
    for _ in range(n):
        # gaps spanning the interesting timer regimes: sub-log-interval,
        # the 90 s / 270 s thresholds, and multi-day jumps past 48 h
        t += draw(
            st.one_of(
                st.integers(min_value=1 * NS, max_value=60 * NS),
                st.integers(min_value=80 * NS, max_value=300 * NS),
                st.integers(min_value=3600 * NS, max_value=50 * 3600 * NS),
                st.integers(min_value=47 * 3600 * NS, max_value=60 * 3600 * NS),
            )
        )
        if draw(st.booleans()):
            records.append(
                dict(
                    kind="log",
                    hash=1,
                    ts=t,
                    dop=draw(st.floats(min_value=0.5, max_value=10.0)),
                    h_acc=draw(st.floats(min_value=1.0, max_value=200.0)),
                    v_acc=draw(st.floats(min_value=1.0, max_value=200.0)),
                )
            )
        else:
            records.append(
                dict(
                    kind="event",
                    hash=1,
                    ts=t,
                    end=t + 1000,
                    time_acc=draw(st.sampled_from([50, 900, 1500, 150_000])),
                    ublox_counter=draw(st.integers(min_value=0, max_value=65535)),
                    fix=draw(st.sampled_from([0, 1])),
                )
            )
    return records


@settings(max_examples=200, deadline=None)
@given(record_streams())
def test_transition_stream_invariants(records):
    trans = replay_station(records)
    names = set(STATUS_NAMES.values())
    last_ts = None
    for a, b in zip(trans, trans[1:]):
        assert a["status"] != b["status"] or a is b, "no-op transition emitted"
    for tr in trans:
        assert tr["status"] in names
        assert last_ts is None or tr["ts"] >= last_ts
        last_ts = tr["ts"]
    if trans:
        assert trans[0]["status"] == "online"
    if not any(r["kind"] == "log" for r in records):
        assert trans == [], "events alone must not create a station"
    for i, tr in enumerate(trans):
        if tr["status"] == "deleted":
            assert any(
                p["status"] == "offline" and p["ts"] <= tr["ts"] for p in trans[:i]
            ), "deleted without a preceding offline"


@settings(max_examples=150, deadline=None)
@given(record_streams(), st.data())
def test_chunked_replay_equals_single_shot(records, data):
    full = replay_station(records)
    cut = data.draw(st.integers(min_value=0, max_value=len(records)))
    t1, state = replay_records(records[:cut])
    t1 = list(t1)
    t2, state = replay_records(records[cut:], state)
    assert t1 + list(t2) == full
