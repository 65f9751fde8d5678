"""Local replica of the driver's DuckDB-oracle comparison.

Runs a ``queries()`` callable on Spark and its ``oracle_sql()`` SQL on
DuckDB over the same parquet tables, then compares row count, column
set, and (order-insensitively) every value. Stricter than the driver
can be assumed to be, so passing here predicts passing there.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb

from datapipe_spark import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_to_oracle(spark, query_fn, sql: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    res = con.sql(sql)
    o_cols = res.columns
    o_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch\n spark: {sorted(s_cols)}\n oracle: {sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), f"row count {len(s_rows)} != oracle {len(o_rows)}"
    sc = _canon(s_rows, s_cols)
    oc = _canon(o_rows, o_cols)
    for i, (a, b) in enumerate(zip(sc, oc)):
        assert a == b, (
            f"value mismatch at sorted-row {i} (cols {sorted(s_cols)}):\n"
            f" spark:  {a}\n oracle: {b}"
        )
