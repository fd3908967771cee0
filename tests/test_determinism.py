"""Partitioning-independence net: every registered query must produce
IDENTICAL results under different shuffle widths.

Distributed float summation is order-dependent; a query whose output
changes with `spark.sql.shuffle.partitions` cannot hash-match a
single-threaded oracle reliably (this class of bug surfaced at sf0.1 as
the distinct_agg_orders mismatch — caught there by a scale sweep, caught
HERE at sf0.001 for every future query). The engine's discipline is
scaled-integer summation / frame-ordered windows / 6-dp-pinned means;
this test enforces it generically.
"""

from __future__ import annotations

import pytest

from detector_network_processor_spark.plans import all_queries

SF_SMALL = "/root/testdata/sf0.001"

QUERIES = all_queries()


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(r[c] for c in cols) for r in df.collect()]

    def key(row):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    return sorted(rows, key=key)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_is_partitioning_independent(spark, name):
    fn = QUERIES[name].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canon(fn(spark, SF_SMALL))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _canon(fn(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: output depends on shuffle partitioning"
