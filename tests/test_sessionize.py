"""Global gap sessionization must match a naive single-threaded reference,
including sessions spanning range-partition boundaries."""

from __future__ import annotations

import numpy as np

from detector_network_processor_spark.operators.sessionize import sessionize_global_gap


def naive_sessions(ts: np.ndarray, gap: int) -> list[int]:
    order = np.argsort(ts, kind="stable")
    sid = 0
    out = np.zeros(len(ts), dtype=int)
    last = None
    for i in order:
        if last is not None and ts[i] - last > gap:
            sid += 1
        out[i] = sid
        last = ts[i]
    return out.tolist()


def test_sessionize_matches_naive(spark):
    rng = np.random.default_rng(3)
    # bursty timestamps: many boundary-spanning chains under 16 partitions
    ts = np.cumsum(rng.choice([1, 5, 20, 2000], size=5000, p=[0.5, 0.3, 0.1, 0.1])).astype(np.int64)
    df = spark.createDataFrame([(int(i), int(t)) for i, t in enumerate(ts)], "id long, ts long")
    out = sessionize_global_gap(df, "ts", gap=10, num_partitions=16).collect()
    expected = naive_sessions(ts, 10)
    got = {r["id"]: r["session_id"] for r in out}
    # session ids need not be equal, only the partition into sessions
    from collections import defaultdict

    def classes(assign):
        c = defaultdict(set)
        for i, s in assign.items():
            c[s].add(i)
        return sorted(frozenset(v) for v in c.values())

    assert classes(got) == classes(dict(enumerate(expected)))


def test_sessionize_single_giant_session(spark):
    df = spark.createDataFrame([(i, i) for i in range(1000)], "id long, ts long")
    out = sessionize_global_gap(df, "ts", gap=5, num_partitions=8).collect()
    assert len({r["session_id"] for r in out}) == 1
