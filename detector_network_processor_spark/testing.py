"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark plan and its oracle SQL side-by-side, sorts columns by name,
and compares row multisets. Mirrors the driver's pandas-based canon:

- the DuckDB side goes through ``.df()`` (pandas), so a HUGEINT ``sum()``
  or a ``floor()`` DOUBLE surfaces as float64 here exactly like it does in
  the driver — an oracle missing a ``CAST(... AS BIGINT)`` fails locally;
- values are compared **type-sensitively**: Python ``150 == 150.0`` is
  True, but the driver's dtype-aware hash treats them as different, so we
  tag every value with an int/float class before comparing.
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
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare_spark_vs_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
    ddf = con.execute(sql).df()
    d_cols = list(ddf.columns)
    d_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(cs, cd)):
        if a != b:
            return False, f"first differing row (sorted) #{i}:\n  spark={a}\n  duck ={b}"
    return True, "ok"
