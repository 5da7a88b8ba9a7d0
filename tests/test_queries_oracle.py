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


def test_q7_overflow_guard_trips(spark, sf_dir, monkeypatch):
    """q7's int64 partial sum carries a cnt×max no-wrap bound that must
    RAISE (not return a wrapped figure) when violated; shrink the bound
    to zero to exercise the trip path the real threshold (2^63-1) makes
    unreachable under sane partition sizing."""
    from eea_crawler_spark.plans import queries as Q

    monkeypatch.setattr(Q, "_Q7_I64_GUARD", 0.0)
    with pytest.raises(Exception, match="int64 partial"):
        Q.QUERIES["q7"](spark, sf_dir).collect()
