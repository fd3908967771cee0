"""Station lifecycle state machine: handcrafted transition scenarios against
the golden replay, plus Spark-vs-golden equivalence."""

from __future__ import annotations

from detector_network_processor_spark.operators.station_golden import (
    NS,
    replay_station,
)

H = 42
GOOD_LOC = dict(dop=1.0, h_acc=10.0, v_acc=10.0)  # precision ~14 m << 299.79*0.85
BAD_LOC = dict(dop=4.0, h_acc=80.0, v_acc=60.0)  # 4*100=400 m > 299.79*1.15
MID_LOC = dict(dop=1.0, h_acc=240.0, v_acc=180.0)  # 300 m, inside hysteresis band


def log(ts_s, loc=GOOD_LOC):
    return dict(kind="log", hash=H, ts=int(ts_s * NS), **loc)


def ev(ts_s, time_acc=100, end_off=500, ublox=0, fix=1):
    t = int(ts_s * NS)
    return dict(kind="event", hash=H, ts=t, end=t + end_off, time_acc=time_acc, ublox_counter=ublox, fix=fix)


def statuses(trans):
    return [(t["status"], t["reason"]) for t in trans]


def test_creation_and_no_reliable_before_rate_warm():
    # The reference computes stddev/(mean*0.75) UNGUARDED
    # (detectorstation.cpp:96): with a zero mean rate the factor is 0/0=NaN,
    # which fails both hysteresis branches — so a station with good location
    # and timing but a cold rate ring must NOT become reliable yet.
    recs = [log(0)] + [ev(10 + i, time_acc=100) for i in range(5)] + [log(60), log(120)]
    trans = replay_station(recs)
    assert statuses(trans)[0] == ("online", "miscellaneous")
    assert ("reliable", "miscellaneous") not in statuses(trans)


def test_reliable_after_rate_warm():
    # steady 1 Hz for 540 s fills the 10x30 s mean-rate ring; once stddev/mean
    # settles below the hysteresis floor the station goes reliable
    steady = [ev(t + 0.5) for t in range(540)]
    logs = [log(t) for t in range(0, 541, 60)]
    trans = replay_station(sorted(logs + steady, key=lambda r: r["ts"]))
    assert statuses(trans)[0] == ("online", "miscellaneous")
    assert statuses(trans)[-1] == ("reliable", "miscellaneous")


def test_bad_location_unreliable():
    # cold rate ring -> NaN rate factor -> no reliable transition before the
    # bad log; the bad log then flips created(online) -> unreliable
    trans = replay_station([log(0), log(60, BAD_LOC)])
    assert statuses(trans) == [
        ("online", "miscellaneous"),
        ("unreliable", "location_precision"),
    ]


def test_hysteresis_band_keeps_state():
    # steady 1 Hz events for 500 s fill the 10x30s rate ring (the
    # zero-initialized ring otherwise flags rate_unstable — cold-start
    # behavior shared with the reference's rate_measurement)
    steady = [ev(t + 0.5) for t in range(540)]
    good_logs = [log(t) for t in range(0, 481, 60)]
    recs = sorted(good_logs + steady, key=lambda r: r["ts"]) + [log(500, MID_LOC), log(540, MID_LOC)]
    trans = replay_station(recs)
    assert statuses(trans)[-1] == ("reliable", "miscellaneous")

    # from the unreliable side, mid-band also keeps unreliable
    bad_logs = [log(t, BAD_LOC) for t in range(0, 481, 60)]
    recs2 = sorted(bad_logs + steady, key=lambda r: r["ts"]) + [log(500, MID_LOC), log(540, MID_LOC)]
    trans2 = replay_station(recs2)
    assert statuses(trans2)[-1] == ("unreliable", "location_precision")


def test_extreme_time_acc():
    trans = replay_station([log(0), ev(1, time_acc=200_000)])
    assert statuses(trans)[-1] == ("unreliable", "time_accuracy_extreme")


def test_missed_log_timers_and_thresholds():
    # gap of 100 s -> unreliable at exactly last_log + 90 s
    trans = replay_station([log(0), ev(1), log(30), ev(130)])
    assert trans[-1]["status"] == "unreliable"
    assert trans[-1]["reason"] == "missed_log_interval"
    assert trans[-1]["ts"] == 30 * NS + 90 * NS

    # gap of 300 s -> unreliable@+90 then offline@+270
    trans = replay_station([log(0), ev(301)])
    tail = statuses(trans)[-2:]
    assert tail == [("unreliable", "missed_log_interval"), ("offline", "missed_log_interval")]
    assert trans[-1]["ts"] == 270 * NS

    # gap beyond 48 h -> deleted, and a later log re-creates the station
    trans = replay_station([log(0), ev(49 * 3600), log(50 * 3600)])
    s = statuses(trans)
    assert ("deleted", "missed_log_interval") in s
    assert s[-1] == ("online", "miscellaneous")


def test_end_of_data_timer():
    trans = replay_station([log(0)], end_of_data_ts=400 * NS)
    assert statuses(trans)[-1] == ("offline", "missed_log_interval")


def test_events_before_first_log_dropped():
    trans = replay_station([ev(0), ev(1), log(10)])
    assert statuses(trans) == [("online", "miscellaneous")]


def test_spark_matches_golden(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    stations = [1, 2, 3, 4]
    logs, events = [], []
    for h in stations:
        t = 0.0
        while t < 4000:
            loc = [GOOD_LOC, BAD_LOC, MID_LOC][int(rng.integers(0, 3))]
            logs.append(dict(hash=h, ts=int(t * NS), **loc))
            for _ in range(int(rng.integers(0, 6))):
                te = t + float(rng.uniform(0, 50))
                events.append(
                    dict(
                        hash=h,
                        start=int(te * NS),
                        end=int(te * NS) + int(rng.integers(100, 900_000)),
                        time_acc=int(rng.choice([100, 800, 5000, 200_000])),
                        ublox_counter=int(rng.integers(0, 65536)),
                        fix=1,
                    )
                )
            t += float(rng.choice([60.0, 80.0, 150.0, 400.0]))

    from detector_network_processor_spark.operators.station import station_lifecycle

    got = station_lifecycle(
        spark.createDataFrame(logs), spark.createDataFrame(events)
    ).collect()

    expected = []
    for h in stations:
        recs = sorted(
            [dict(kind="log", **l) for l in logs if l["hash"] == h]
            + [
                dict(kind="event", hash=e["hash"], ts=e["start"], **{k: e[k] for k in ("end", "time_acc", "ublox_counter", "fix")})
                for e in events
                if e["hash"] == h
            ],
            key=lambda r: (r["ts"], 0 if r["kind"] == "log" else 1),
        )
        expected.extend(replay_station(recs))

    def canon(rows):
        return sorted((r["hash"], r["ts"], r["status"], r["reason"]) for r in rows)

    assert canon([r.asDict() for r in got]) == canon(expected)
