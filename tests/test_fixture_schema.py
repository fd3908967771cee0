"""Fixture-drift guard (round-2 post-mortem, VERDICT.md r2 "What's wrong" #1).

The driver regenerates /root/testdata between rounds and has already changed
the parquet encoding of events.ts once (TIMESTAMP(NANOS) -> timestamp[us]),
which silently broke 20 queries whose plans hard-coded the old dtype. These
tests pin the engine's schema assumptions against the actual parquet footers
(no Spark jobs) so any future drift fails loudly HERE, with a message naming
the adaptive helper, instead of as 20 downstream AnalysisExceptions.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from conftest import SF_DIR_SMALL
from detector_network_processor_spark.io import TABLES, ts_to_us

# Columns the engine's plans address by name, per table. Extra columns in
# the fixture are fine (plans project); MISSING columns are a hard break.
_REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey", "p_brand", "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority"},
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source"},
    "embeddings": {"vec_id", "embedding", "label"},
}

# Encodings ts_to_us understands. If this assertion fires, extend
# io.ts_to_us with the new encoding — do NOT patch individual plans.
_TS_ENCODINGS = {"timestamp[ns]", "timestamp[us]", "timestamp[ms]", "timestamp[s]", "int64"}


def _footer_schema(table: str):
    path = os.path.join(SF_DIR_SMALL, f"{table}.parquet")
    if os.path.isdir(path):
        path = next(
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).schema_arrow


@pytest.mark.parametrize("table", TABLES)
def test_required_columns_present(table):
    schema = _footer_schema(table)
    missing = _REQUIRED_COLUMNS[table] - set(schema.names)
    assert not missing, (
        f"fixture drift: {table}.parquet lost columns {sorted(missing)} — "
        f"engine plans address these by name"
    )


def test_events_ts_encoding_is_adaptable():
    schema = _footer_schema("events")
    ts_type = str(schema.field("ts").type)
    assert ts_type in _TS_ENCODINGS, (
        f"fixture drift: events.ts is now parquet {ts_type!r}, which "
        f"io.ts_to_us does not normalize. Extend ts_to_us (the single "
        f"boundary-normalization point) rather than touching plans."
    )


def test_ts_to_us_matches_duckdb_epoch_us(spark):
    """End-to-end pin: ts_to_us must reproduce DuckDB epoch_us exactly on
    the CURRENT fixture encoding (min/max/sum over the whole table)."""
    import duckdb

    from detector_network_processor_spark.io import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_DIR_SMALL, "events")
    row = ev.select(ts_to_us(ev).alias("us")).agg(
        F.min("us").alias("mn"), F.max("us").alias("mx"), F.sum("us").alias("sm")
    ).first()
    want = duckdb.sql(
        "SELECT min(epoch_us(ts)), max(epoch_us(ts)), sum(epoch_us(ts))::BIGINT "
        f"FROM read_parquet('{SF_DIR_SMALL}/events.parquet')"
    ).fetchone()
    assert (row.mn, row.mx, row.sm) == want


def test_ts_to_us_int64_ns_branch(spark):
    """The legacy int64-nanoseconds branch stays exact (covers the older
    TIMESTAMP(NANOS)+nanosAsLong fixture vintage)."""
    df = spark.createDataFrame(
        [(1_700_000_000_123_456_789,), (999,), (-1_000,)], "ts long"
    )
    got = [r.us for r in df.select(ts_to_us(df).alias("us")).collect()]
    assert got == [1_700_000_000_123_456, 0, -1]  # floor div, exact


def test_events_props_has_k_key():
    """The EAV/sink/detector_log queries extract props->'$.k'; if a fixture
    regeneration drops that key they would emit all-NULL values and pass
    vacuously. Pin it in the actual data (first row group, footerless read
    of a single file)."""
    import json

    path = os.path.join(SF_DIR_SMALL, "events.parquet")
    if os.path.isdir(path):
        path = next(
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        )
    props = pq.ParquetFile(path).read(columns=["props"])["props"].to_pylist()[:50]
    assert any("k" in json.loads(p or "{}") for p in props), (
        "fixture drift: events.props no longer carries the 'k' key used by "
        "assembly_kv_pivot / assembly_eav_collect / eav_json_stats / "
        "sink_detector_log_* — update those framings together"
    )


def test_documents_text_is_space_tokenizable():
    """Every text-analysis query splits on single spaces; a regeneration
    that switches to tabs/newlines would silently yield one-token docs."""
    path = os.path.join(SF_DIR_SMALL, "documents.parquet")
    if os.path.isdir(path):
        path = next(
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")
        )
    texts = pq.ParquetFile(path).read(columns=["text"])["text"].to_pylist()[:50]
    assert sum(" " in (t or "") for t in texts) > 25, (
        "fixture drift: documents.text no longer space-delimited — the "
        "token-based queries (text_quality, bpe_*, dsir, near-dup family) "
        "assume split(text, ' ')"
    )
