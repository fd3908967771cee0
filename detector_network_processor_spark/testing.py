"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark plan and its oracle SQL side-by-side, sorts columns by name,
and compares row multisets (exact for ints/strings/bools, tiny-epsilon for
floats — both sides round explicitly inside the queries, so disagreement
means a real semantic bug, not FP noise).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from .io import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def compare_spark_vs_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(cs, cd)):
        if a != b:
            return False, f"first differing row (sorted) #{i}:\n  spark={a}\n  duck ={b}"
    return True, "ok"
