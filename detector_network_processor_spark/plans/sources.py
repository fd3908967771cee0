"""Driver-visible queries for the source/parser layer (SURVEY.md §2.1
S2/S6/S7) — synthesize MQTT (topic, payload) lines from the events fixture
IN THE PLAN, push them through the real parser, and adjudicate the
survivors against an arithmetic DuckDB oracle.

This closes the gap where the line parsers were pytest-only: the driver
now hash-checks the validation rules (topic shape, 'cluster' exclusion,
timestamp length/format, numeric casts, start <= end) and the exact
DECIMAL(30,9)-seconds -> int64-ns conversion (reference
include/source/mqtt.h:214-247, 391-396).

The xxhash64 station key (S6) is intentionally NOT in the driver
projection: Spark's xxhash64 has no DuckDB equivalent; its stability is
pinned by tests/test_streaming.py instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..io import load_table, ts_to_us
from . import register
from ..config import python_stage_partitions

# Deterministic malformed-row injection (each exercises one Error path):
_MOD_CLUSTER = 11  # username 'cluster' -> S7 topic filter drop
_MOD_SHORT_TOPIC = 23  # 3-part topic -> size(_t) >= 4 drop
_MOD_SHORT_TS = 19  # 10-char timestamp -> length >= 17 drop
_MOD_END_BEFORE = 17  # end < start -> ordering drop
_MOD_BAD_NUM = 13  # non-numeric time_acc -> try_cast NULL drop


def _survivor_pred_sql() -> str:
    return " AND ".join(
        f"event_id % {m} != 0"
        for m in (_MOD_CLUSTER, _MOD_SHORT_TOPIC, _MOD_SHORT_TS, _MOD_END_BEFORE, _MOD_BAD_NUM)
    )


@register(
    "parse_event_lines",
    oracle=f"""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
SELECT 'u' || user_id AS username,
       's' || (event_id % 9) AS station_id,
       us * 1000 AS start,
       (us + (event_id % 1000) + 1) * 1000 AS "end",
       CAST(event_id % 3000 AS INTEGER) AS time_acc,
       CAST(event_id % 65536 AS INTEGER) AS ublox_counter,
       CAST(1 AS INTEGER) AS fix,
       CAST(event_id % 2 AS INTEGER) AS gnss_time_grid,
       CAST(event_id % 10 AS INTEGER) AS utc
FROM ev
WHERE {_survivor_pred_sql()}
ORDER BY username, start, station_id
""",
    doc="S2/S6/S7 line-source round trip: MQTT lines synthesized from the events fixture (with five deterministic malformed families: 'cluster' username, short topic, short timestamp, end<start, non-numeric field), parsed by sources/lines.py::parse_events, survivors hash-checked against the arithmetic oracle. Proves the DECIMAL(30,9)s->ns conversion is exact (reference include/source/mqtt.h:214-247).",
)
def parse_event_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.lines import parse_events

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select("user_id", "event_id", ts_to_us(ev_raw).alias("us"))
    eid = F.col("event_id")

    def secs(us_col):  # epoch-seconds string with 9 decimals (>= 17 chars)
        return F.concat(
            (us_col / 1_000_000).cast("long").cast("string"),
            F.lit("."),
            F.lpad((us_col % 1_000_000).cast("string"), 6, "0"),
            F.lit("000"),
        )

    start_s = secs(F.col("us"))
    end_us = F.col("us") + eid % 1000 + 1
    username = F.when(eid % _MOD_CLUSTER == 0, F.lit("cluster")).otherwise(
        F.concat(F.lit("u"), F.col("user_id"))
    )
    topic = F.when(
        eid % _MOD_SHORT_TOPIC == 0, F.concat_ws("/", F.lit("muonpi"), F.lit("data"), username)
    ).otherwise(
        F.concat_ws("/", F.lit("muonpi"), F.lit("data"), username,
                    F.concat(F.lit("s"), eid % 9))
    )
    f0 = F.when(eid % _MOD_SHORT_TS == 0, F.substring(start_s, 1, 10)).otherwise(start_s)
    f1 = F.when(eid % _MOD_END_BEFORE == 0, secs(F.col("us") - 1_000_000)).otherwise(secs(end_us))
    time_acc = F.when(eid % _MOD_BAD_NUM == 0, F.concat(F.lit("x"), eid % 3000)).otherwise(
        (eid % 3000).cast("string")
    )
    payload = F.concat_ws(
        " ", f0, f1, time_acc, (eid % 65536).cast("string"), F.lit("1"),
        (eid % 2).cast("string"), (eid % 10).cast("string"),
    )
    # Materialize the synthesized lines once. Without the persist barrier,
    # CollapseProject/PushDownPredicate inline the payload-synthesis tree
    # (lpad/concat string builds) into EVERY downstream split()/filter
    # reference — the synthesis re-runs ~15x per row and dominates the query
    # (measured 5.7 s -> 1.2 s at sf0.1). The repartition also spreads the
    # decimal(30,9) parse across all cores instead of the fixture's single
    # input split; in production the lines arrive pre-partitioned from the
    # broker and this whole block is replaced by the source itself.
    lines = (
        ev.select(topic.alias("topic"), payload.alias("payload"))
        .repartition(python_stage_partitions(spark))
        .persist()
    )
    return parse_events(lines).drop("hash").orderBy("username", "start", "station_id")
