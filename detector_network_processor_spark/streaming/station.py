"""Streaming station lifecycle state machine (SURVEY.md §2.8) via
``applyInPandasWithState`` keyed by station hash.

The per-record semantics are byte-identical to the batch replay — both call
``station_golden.replay_records``; the streaming wrapper only adds state
(de)serialization to the Spark state store. Records must arrive per-station
time-ordered across micro-batches (within a batch they are sorted); an
event-time watermark upstream is the caller's tool to bound disorder.

No processing-time timeout is registered: the reference's gap timers are
event-time here (they fire on the next record's timestamp — the batch
canonical semantics). A deployment that needs "goes offline with no traffic
at all" alerts can set ProcessingTimeTimeout and call state.step(now) in
the timeout branch; that reintroduces wall-clock nondeterminism, so it is
off by default.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.station import TRANSITION_SCHEMA
from ..operators.station_golden import replay_records, state_from_row, state_to_row

STATE_SCHEMA = StructType(
    [
        StructField("hash", LongType()),
        StructField("status", IntegerType()),
        StructField("last_log", LongType()),
        StructField("dop", DoubleType()),
        StructField("h_acc", DoubleType()),
        StructField("v_acc", DoubleType()),
        StructField("initial", BooleanType()),
        StructField("last_ublox", IntegerType()),
        StructField("incoming", LongType()),
        StructField("ublox_progress", LongType()),
        StructField("cur_slots", ArrayType(DoubleType())),
        StructField("cur_counter", LongType()),
        StructField("cur_interval_start", LongType()),
        StructField("mean_slots", ArrayType(DoubleType())),
        StructField("mean_counter", LongType()),
        StructField("mean_interval_start", LongType()),
        StructField("pulse_buf", ArrayType(DoubleType())),
        StructField("time_acc_buf", ArrayType(DoubleType())),
        StructField("rel_time_acc_buf", ArrayType(DoubleType())),
        StructField("factor", DoubleType()),
        StructField("status_ts", LongType()),
    ]
)


def _update(key, pdfs, state: GroupState):
    prior = state_from_row(state.get) if state.exists else None
    frames = [pdf for pdf in pdfs if len(pdf)]
    transitions: list[dict] = []
    if frames:
        pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        pdf = pdf.sort_values(["ts", "kind"], kind="mergesort", ascending=[True, False])
        transitions, new_state = replay_records(pdf.to_dict("records"), prior)
        row = state_to_row(new_state)
        if row is not None:
            state.update(row)
    yield pd.DataFrame(transitions, columns=["hash", "ts", "status", "reason"])


def stream_station_lifecycle(merged: DataFrame) -> DataFrame:
    """merged: streaming DataFrame with the batch operator's merged-record
    shape (hash, ts, kind, end, time_acc, ublox_counter, fix, dop, h_acc,
    v_acc). Returns the append-mode transition stream."""
    return merged.groupBy("hash").applyInPandasWithState(
        _update,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
