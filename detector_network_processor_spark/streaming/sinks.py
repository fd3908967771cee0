"""Sinks (SURVEY.md §2.9). The engine's canonical sink is parquet via
``foreachBatch`` (K4/K5 analog); the MQTT/InfluxDB network links are
peripheral per the north star (BASELINE.json) and are modeled as line/point
FORMATTERS (pure column expressions, oracle-testable) that any transport
callback can drain.

- K1 text line format (include/sink/mqtt.h:146-184): one line per
  constituent of each n>=2 coincidence, uuid from (hash, start), relative
  times.
- K2 InfluxDB line protocol (include/sink/database.h:134-165): measurement
  L1Event, one point per constituent, timestamped at the constituent start.
- K4 histogram files (src/analysis/stationcoincidence.cpp:111-212) ->
  partitioned parquet writer + the same content as csv lines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def l1_text_lines(l1_flat: DataFrame) -> DataFrame:
    """K1: space-separated text lines from the flattened L1 table
    (operators/coincidence.l1_flatten output)."""
    return l1_flat.select(
        F.concat_ws(
            " ",
            F.col("uuid"),
            F.col("pos"),
            F.col("n"),
            (F.col("start") - F.col("group_start")).alias("rel_start"),
            (F.col("end") - F.col("group_start")),
            F.col("hash"),
            F.col("time_acc"),
            F.col("conflicting").cast("int"),
            F.col("true_e"),
        ).alias("line")
    )


def l1_influx_points(l1_flat: DataFrame, measurement: str = "L1Event") -> DataFrame:
    """K2: InfluxDB line-protocol points, one per constituent, timestamped
    at the constituent start (ns)."""
    return l1_flat.select(
        F.concat(
            F.lit(f"{measurement},hash="),
            F.col("hash"),
            F.lit(" uuid=\""),
            F.col("uuid"),
            F.lit("\",n="),
            F.col("n"),
            F.lit("i,true_e="),
            F.col("true_e"),
            F.lit("i,conflicting="),
            F.col("conflicting").cast("int"),
            F.lit("i,time_acc="),
            F.col("time_acc"),
            F.lit("i "),
            F.col("start"),
        ).alias("point")
    )


def write_stream_parquet(df: DataFrame, path: str, checkpoint: str, trigger_seconds: int | None = None):
    """K4/K5: the durable sink — append-mode parquet with checkpointing."""
    writer = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    ).outputMode("append")
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def foreach_batch_collector(callback):
    """Adapter for network links (MQTT publish, Influx write): calls
    ``callback(list_of_rows, batch_id)`` per micro-batch with the formatted
    lines — the transport client stays outside the engine."""

    def handle(batch_df: DataFrame, batch_id: int):
        callback(batch_df.collect(), batch_id)

    return handle


def save_histograms(hist: DataFrame, path: str, mode: str = "overwrite") -> None:
    """A8: periodic histogram dump — partitioned by pair for selective
    reads; the offline merge job (operators/histogram.merge_histograms)
    reads these back."""
    hist.write.mode(mode).partitionBy("hash_lo").parquet(path)
