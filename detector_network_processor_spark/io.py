"""Table loading for the driver's parquet fixtures (TESTDATA.md).

Plain ``spark.read.parquet`` scans: Catalyst handles predicate pushdown,
column pruning and partition pruning on these; nothing custom needed
(SURVEY.md §2.1 S8, §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    # default; read it as int64 nanoseconds — the engine's native time
    # representation anyway (SURVEY.md §1.1: exact i64 ns arithmetic).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
