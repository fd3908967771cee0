"""Stateful message-assembly sources (SURVEY.md §2.1 S3/S4/S5), batch form.

The reference assembles logical records from multiple MQTT messages:
- S3: count-based reassembly — first message carries multiplicity n, the
  record emits when n parts arrived (include/source/mqtt.h:169-212)
- S4: key-value pivot — one location record from >=6 separate key-value
  messages with a completion bitmask (include/source/mqtt.h:126-167)
- S5: EAV accumulation committed per time window (include/source/mqtt.h:250-349)

Batch mapping (SURVEY §2.1): groupBy + conditional aggregation / pivot /
ordered collect — one hash shuffle each, no state store needed because the
batch boundary replaces the assembly timeout. Streaming variants use
applyInPandasWithState (streaming/ module).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def count_based_assembly(
    msgs: DataFrame, key_cols: list[str], expected_n_col: str, payload_col: str
) -> DataFrame:
    """S3: emit one row per key group iff the group reached its expected
    multiplicity (the first message's declared n)."""
    grouped = msgs.groupBy(*key_cols).agg(
        F.min(expected_n_col).alias("expected_n"),
        F.count(F.lit(1)).alias("n_parts"),
        F.sort_array(F.collect_list(payload_col)).alias("parts"),
    )
    return grouped.filter(F.col("n_parts") >= F.col("expected_n"))


def kv_pivot_assembly(
    kv: DataFrame, key_cols: list[str], name_col: str, value_col: str, names: list[str],
    order_cols: list[str],
) -> DataFrame:
    """S4: pivot the FIRST value of each expected name into columns, with a
    completion bitmask over ``names``."""
    w = Window.partitionBy(*key_cols, name_col).orderBy(*order_cols)
    firsts = kv.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    aggs = [
        F.max(F.when(F.col(name_col) == n, F.col(value_col))).alias(n.replace("-", "_"))
        for n in names
    ]
    mask = None
    for i, n in enumerate(names):
        bit = F.when(F.max(F.when(F.col(name_col) == n, F.lit(1))) == 1, F.lit(1 << i)).otherwise(0)
        mask = bit if mask is None else mask + bit
    return firsts.groupBy(*key_cols).agg(*aggs, mask.alias("bitmask")).withColumn(
        "complete", F.col("bitmask") == (1 << len(names)) - 1
    )


def eav_collect(
    eav: DataFrame, key_cols: list[str], name_col: str, value_col: str
) -> DataFrame:
    """S5: commit one EAV collection per key group, deterministically
    ordered (name, value)."""
    item = F.concat_ws("=", F.col(name_col), F.col(value_col))
    return eav.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.concat_ws(",", F.sort_array(F.collect_list(item))).alias("items"),
    )
