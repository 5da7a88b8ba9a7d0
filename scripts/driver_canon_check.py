#!/usr/bin/env python
"""Replicate the driver's correctness gate locally (strict pandas canon).

The driver compares Spark ``.toPandas()`` against DuckDB ``.df()`` after
sorting columns by name, ``sort_values`` over all columns, and hashing
the stringified frame. That canon is STRICTER than tests/oracle_utils
(which compares typed values): int64 ``5`` vs float64 ``5.0`` stringify
apart, Decimal('123.40') vs 123.4 stringify apart, and list cells crash
``sort_values`` outright. Run this before every round:

    python scripts/driver_canon_check.py [sf_dir]

Prints one line per declared query: OK / ROWS / HASH / ERR (+ first
differing cells for HASH).
"""

from __future__ import annotations

import hashlib
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import duckdb_connect  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df.astype(str)


def _hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from eea_crawler_spark.plans import ORACLE, QUERIES
    from eea_crawler_spark.session import get_spark

    spark = get_spark("canon-check", data_dir=sf_dir)
    con = duckdb_connect(sf_dir)
    n_bad = 0
    for name, fn in QUERIES.items():
        try:
            sdf = _canon(fn(spark, sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERR spark-side: {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        if name not in ORACLE:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = _canon(con.execute(ORACLE[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERR oracle-side: {type(ex).__name__}: {ex}")
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"{name}: ROWS spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1
        elif sorted(sdf.columns) != sorted(odf.columns):
            print(f"{name}: SCHEMA spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_bad += 1
        elif _hash(sdf) != _hash(odf):
            n_bad += 1
            diff = (sdf != odf).any(axis=0)
            badcols = [c for c in sdf.columns if diff.get(c, False)]
            print(f"{name}: HASH differing cols={badcols}")
            for c in badcols[:3]:
                mask = sdf[c] != odf[c]
                i = mask.idxmax()
                print(f"    {c}[{i}]: spark={sdf[c][i]!r} oracle={odf[c][i]!r}")
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILING'}")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
