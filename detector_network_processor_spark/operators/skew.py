"""Skew mitigation helpers (SURVEY.md §7.2 step 8).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most runtime skew. These helpers cover the
two places AQE can't:

- **Salted aggregation**: a hot group key (one detector station producing
  50% of events; one shingle appearing in every document) funnels its whole
  group through one reducer. Two-phase salted aggregation splits the hot
  key across ``n_salts`` partial groups, then combines — correct for any
  algebraic aggregate (sum/count/min/max).
- **Frequency-capped explode** (stop-shingle pruning): drop join keys whose
  posting list exceeds a cap before a pair-generating self-join — the
  quadratic blowup guard for the near-dup inverted index at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_sum_count(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe sum/count per key.

    Equivalent to ``df.groupBy(keys).agg(sum, count)`` but the first shuffle
    distributes each key over ``n_salts`` reducers. Use when one key owns an
    outsized share of rows; for well-distributed keys the extra phase costs
    one small second shuffle (#keys x n_salts rows).
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias(f"sum_{value_col}"), F.sum("_pcnt").alias("n_rows")
    )


def cap_key_frequency(df: DataFrame, key_col: str, cap: int) -> DataFrame:
    """Drop rows whose key occurs more than ``cap`` times (stop-shingle /
    stop-key pruning before a pair-generating self-join). The count runs as
    one map-side-combined aggregation; the filter is a broadcast-able
    semi-join when the surviving key set is small, else a shuffled one."""
    freq = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_f")).filter(F.col("_f") <= cap)
    return df.join(freq.select(key_col), key_col, "left_semi")
