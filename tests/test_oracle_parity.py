"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from detector_network_processor_spark.plans import all_queries
from detector_network_processor_spark.testing import compare_spark_vs_oracle, duckdb_connect

from conftest import SF_DIR

QUERIES = all_queries()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle_con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    ok, msg = compare_spark_vs_oracle(df, oracle_con, spec.oracle)
    assert ok, f"{name}: {msg}"
