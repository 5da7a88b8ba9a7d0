"""Q1-Q32 hash-compare vs the DuckDB oracle at sf0.001 (driver gate mirror)."""

from __future__ import annotations

import pytest

from eea_crawler_spark.plans.queries import ORACLE, QUERIES
from tests.oracle_utils import assert_match, duckdb_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE, key=lambda n: int(n[1:])))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    assert_match(name, df, con, ORACLE[name])
