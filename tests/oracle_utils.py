"""Canonicalized Spark-vs-DuckDB row comparison, mirroring the driver gate.

The driver sorts columns by name, canonicalizes cell values, and hashes.
Locally we keep full row lists for debuggable diffs: floats are
``repr(round(v, 6))``, decimals ``str``, dates/timestamps ISO, NULL a
sentinel. Row order is compared as returned (every declared query carries
a total ORDER BY).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

NULL = "␀"  # ␀ sentinel

TABLE_NAMES = (
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


def canon_cell(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(rows, colnames) -> list[tuple[str, ...]]:
    """Canonicalize and order columns by name (driver compare contract)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return [tuple(canon_cell(row[i]) for i in order) for row in rows]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols


def spark_rows(df):
    cols = df.columns
    return [tuple(row) for row in df.collect()], cols


def assert_match(name: str, df, con, sql: str) -> None:
    actual_rows, actual_cols = spark_rows(df)
    expect_rows, expect_cols = run_oracle(con, sql)
    assert sorted(actual_cols) == sorted(expect_cols), (
        f"{name}: column names differ: spark={actual_cols} duckdb={expect_cols}"
    )
    a = canon_rows(actual_rows, actual_cols)
    e = canon_rows(expect_rows, expect_cols)
    assert len(a) == len(e), f"{name}: row count {len(a)} != {len(e)}"
    for i, (ra, re_) in enumerate(zip(a, e)):
        assert ra == re_, f"{name}: row {i} differs:\n  spark={ra}\n  duckdb={re_}"
