"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query on sf0.001 (smoke check).
- ``queries()``: every implemented operator from SURVEY.md §2 / §2.11.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted for
  non-SQL-expressible operators → driver records rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from detector_network_processor_spark.plans import all_queries, evidence_ordered_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_FLAGSHIP = "l1_coincidence"  # the §2.5 coincidence-clustering operator


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_queries()[_FLAGSHIP]
    return spec.fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Driver-facing: ordered weakest-driver-evidence-first so the driver's
    # 50-query prefix sample rotates adjudication over the whole registry
    # (library consumers get stable registration order from all_queries()).
    return {name: spec.fn for name, spec in evidence_ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in evidence_ordered_queries().items()
        if spec.oracle is not None
    }
