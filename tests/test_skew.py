"""Skew helpers: salted aggregation equivalence + frequency capping."""

from __future__ import annotations

import pyspark.sql.functions as F

from detector_network_processor_spark.operators.skew import cap_key_frequency, salted_sum_count


def test_salted_sum_count_matches_plain(spark):
    # 90% of rows on one hot key
    rows = [(0 if i % 10 != 9 else i % 7, float(i)) for i in range(20000)]
    df = spark.createDataFrame(rows, "k long, v double")
    plain = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {(r.k): (r.sum_v, r.n_rows) for r in salted_sum_count(df, ["k"], "v").collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6 * max(1.0, abs(plain[k][0]))


def test_cap_key_frequency(spark):
    rows = [("hot", i) for i in range(100)] + [("cold1", 1), ("cold2", 2), ("cold2", 3)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = cap_key_frequency(df, "k", cap=10).collect()
    keys = {r.k for r in out}
    assert keys == {"cold1", "cold2"} and len(out) == 3
