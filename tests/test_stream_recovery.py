"""Checkpoint recovery: a stateful streaming query stopped mid-input and
restarted from the same checkpoint must produce EXACTLY the single-pass
result — no lost sessions, no duplicated emissions, open sessions carried
across the restart in the state store.

This is the production claim behind every streaming operator here: on a
real cluster, executors die and queries are redeployed; Structured
Streaming's offset log + state store make that a non-event. The test
simulates the redeploy: phase 1 processes the first half of the input
files and stops; more files land; phase 2 restarts the SAME query on the
SAME checkpoint. The parquet sink persists output across the restart, so
any duplicate re-emission of phase-1 batches (broken offset tracking) or
dropped boundary-spanning session (broken state recovery) breaks the
batch-equivalence assertion.

Ref parity: the reference daemon survives broker reconnects without
re-emitting L1 triggers (reference src/ mqtt handling); here the same
guarantee falls out of checkpointed offsets + state.
"""

from __future__ import annotations

import shutil
import tempfile

from detector_network_processor_spark.operators.coincidence import cluster_coincidences
from detector_network_processor_spark.streaming.coincidence import stream_cluster_coincidences

from muon_fixtures import STATIONS, make_events


def _canon(rows, sentinel_start):
    out = {}
    for r in rows:
        d = r.asDict(recursive=True)
        if d["start"] >= sentinel_start:
            continue
        key = tuple(sorted((e["hash"], e["start"]) for e in d["events"]))
        # duplicate emission of the same session key must be visible
        assert key not in out, f"duplicate session emitted: {key}"
        out[key] = (d["start"], d["end"], d["n"], d["conflicting"], d["true_e"])
    return out


def test_restart_from_checkpoint_matches_single_pass_batch(spark):
    events = make_events(n_base=800, seed=31)
    stations = {s[0]: s for s in STATIONS}
    enriched = [
        {**e, "lat": stations[e["hash"]][1], "lon": stations[e["hash"]][2], "h": stations[e["hash"]][3]}
        for e in events
    ]
    ev_df = spark.createDataFrame(enriched)
    batch = cluster_coincidences(ev_df, stations=None, criterion="physics").collect()
    schema = ev_df.schema

    tmp = tempfile.mkdtemp(prefix="dnp_recovery_")
    try:
        # 4 time-ordered chunks; the phase boundary (after f1) falls inside
        # sessions, so recovery must carry OPEN session state, not just
        # offsets.
        enriched.sort(key=lambda e: e["start"])
        n = len(enriched)
        q = n // 4
        chunks = [enriched[:q], enriched[q : 2 * q], enriched[2 * q : 3 * q], enriched[3 * q :]]
        for i, chunk in enumerate(chunks[:2]):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(f"{tmp}/in/f{i}")

        def run_pass() -> None:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{tmp}/in/f*")
            )
            qh = (
                stream_cluster_coincidences(stream, criterion="physics")
                .writeStream.format("parquet")
                .option("path", f"{tmp}/out")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            qh.awaitTermination(300)

        # phase 1: first half, clean stop (deploy rollover / executor loss)
        run_pass()

        # more input lands while the query is down; the far-future sentinel
        # advances the watermark past every real session in phase 2
        for i, chunk in enumerate(chunks[2:], start=2):
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(f"{tmp}/in/f{i}")
        sentinel_start = max(e["start"] for e in enriched) + 10**12
        sentinel = [
            dict(
                hash=1001, start=sentinel_start, end=sentinel_start + 100, time_acc=1,
                ublox_counter=0, fix=1, lat=47.0, lon=8.0, h=450.0,
            )
        ]
        spark.createDataFrame(sentinel, schema).coalesce(1).write.parquet(f"{tmp}/in/f9_sentinel")

        # phase 2: restart on the SAME checkpoint. f0/f1 are still present in
        # the source dir — the offset log must skip them (no reprocessing);
        # the state store must resume the sessions left open at the boundary.
        run_pass()

        got = spark.read.parquet(f"{tmp}/out").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    cb = _canon(batch, sentinel_start)
    cs = _canon(got, sentinel_start)
    assert len(cs) == len(cb), f"group counts differ: batch={len(cb)} recovered-stream={len(cs)}"
    assert cs == cb


def test_incremental_batch_replay_is_idempotent(spark):
    """The SCALE streaming path (incremental micro-batch engine) documents
    replay safety: foreachBatch redelivers a crashed batch's id unchanged,
    batch N re-reads exactly the pre-N state version and OVERWRITES both
    its output directory and its state version
    (streaming/incremental.py module docstring). Exercise the actual crash
    schedule: process batches 0,1, replay batch 1 (crash-redelivery), then
    continue 2,3 + flush — the final corpus must equal the single-pass
    batch result with zero duplicated groups."""
    import os

    from detector_network_processor_spark.streaming.incremental import (
        flush_incremental_state,
        process_increment,
    )

    events = make_events(n_base=600, seed=37)
    stations = {s[0]: s for s in STATIONS}
    enriched = [
        {**e, "lat": stations[e["hash"]][1], "lon": stations[e["hash"]][2], "h": stations[e["hash"]][3]}
        for e in events
    ]
    ev_df = spark.createDataFrame(enriched)
    batch_ref = cluster_coincidences(ev_df, stations=None, criterion="physics").collect()
    schema = ev_df.schema

    tmp = tempfile.mkdtemp(prefix="dnp_replay_")
    try:
        enriched.sort(key=lambda e: e["start"])
        n = len(enriched)
        q = n // 4
        chunks = [enriched[:q], enriched[q : 2 * q], enriched[2 * q : 3 * q], enriched[3 * q :]]
        out, state = f"{tmp}/out", f"{tmp}/state"

        def run(bid: int) -> None:
            process_increment(
                spark, spark.createDataFrame(chunks[bid], schema), state, out, batch_id=bid,
                criterion="physics",
            )

        def emitted():
            return _canon(spark.read.parquet(out).collect(), float("inf"))

        run(0)
        run(1)
        after_first = emitted()
        state_v1 = spark.read.parquet(f"{state}/v{1:012d}").collect()

        # crash redelivery: batch 1 runs AGAIN with the same id. The prune
        # policy must have kept v0 (the version batch 1 reads), and both
        # writes must overwrite, not append.
        assert os.path.isdir(f"{state}/v{0:012d}"), "pre-replay state version was pruned"
        run(1)
        assert emitted() == after_first, "replayed batch changed the emitted output"
        assert sorted(map(str, spark.read.parquet(f"{state}/v{1:012d}").collect())) == sorted(
            map(str, state_v1)
        ), "replayed batch changed the carried state"

        run(2)
        run(3)
        flush_incremental_state(spark, state, out, criterion="physics")
        got = spark.read.parquet(out).drop("batch_id").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    sentinel = float("inf")
    cb = _canon(batch_ref, sentinel)
    cs = _canon(got, sentinel)  # _canon also asserts no duplicate groups
    assert len(cs) == len(cb), f"group counts differ: batch={len(cb)} replayed-stream={len(cs)}"
    assert cs == cb
