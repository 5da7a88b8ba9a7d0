"""Incremental-sync semantics: oracle parity + hypothesis property tests.

Property tier (SURVEY §5.2.4): random (listing, state) pairs assert the
algebraic laws the reference's sync loop relies on — partition of the
listing into due/unchanged, deletes = state ∖ listing, upsert
idempotence, and quarantine budget monotonicity.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eea_crawler_spark.operators import incremental as INC
from eea_crawler_spark.plans.sync import SYNC_ORACLE, SYNC_QUERIES
from tests.oracle_utils import assert_match, duckdb_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SYNC_ORACLE))
def test_sync_matches_oracle(name, spark, sf_dir, con):
    assert_match(name, SYNC_QUERIES[name](spark, sf_dir), con, SYNC_ORACLE[name])


LISTING_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("modified", T.StringType())]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("modified", T.StringType()),
        T.StructField("errors", T.ArrayType(T.StringType())),
    ]
)

ids = st.integers(min_value=0, max_value=15)
stamps = st.sampled_from(["a", "b", None])
side = st.dictionaries(ids, stamps, max_size=10)

prop_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(listing=side, state=side, erring=st.sets(ids, max_size=3))
@prop_settings
def test_diff_partitions_listing(spark, listing, state, erring):
    ldf = spark.createDataFrame(
        [(i, m) for i, m in listing.items()], LISTING_SCHEMA
    )
    sdf = spark.createDataFrame(
        [(i, m, ["e"] if i in erring else []) for i, m in state.items()],
        STATE_SCHEMA,
    )
    due = {r["id"]: r["change_type"] for r in INC.sync_diff(ldf, sdf).collect()}
    for i, m in listing.items():
        if i not in state:
            assert due.get(i) == "new"
        elif i in erring:
            assert due.get(i) == "error_retry"
        elif state[i] != m:
            assert due.get(i) == "changed"
        else:
            assert i not in due  # unchanged listings stay out
    assert set(due) <= set(listing)


@given(listing=side, state=side)
@prop_settings
def test_deletes_are_state_minus_listing(spark, listing, state):
    ldf = spark.createDataFrame([(i, m) for i, m in listing.items()], LISTING_SCHEMA)
    sdf = spark.createDataFrame(
        [(i, m, []) for i, m in state.items()], STATE_SCHEMA
    )
    got = {r["id"] for r in INC.deletion_candidates(sdf, ldf).collect()}
    assert got == set(state) - set(listing)


@given(cur=side, upd=side)
@prop_settings
def test_upsert_idempotent_and_update_wins(spark, cur, upd):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    cdf = spark.createDataFrame([(i, m) for i, m in cur.items()], schema)
    udf = spark.createDataFrame([(i, m) for i, m in upd.items()], schema)
    once = INC.upsert_last_wins(cdf, udf, key="id", order_col="v")
    twice = INC.upsert_last_wins(once, udf, key="id", order_col="v")
    rows_once = {(r["id"], r["v"]) for r in once.collect()}
    rows_twice = {(r["id"], r["v"]) for r in twice.collect()}
    assert rows_once == rows_twice  # idempotent under re-delivery
    assert {r[0] for r in rows_once} == set(cur) | set(upd)  # keyed union


def test_quarantine_budget(spark):
    """A doc errored every run: budget builds, then skips, then the
    entry expires (dropped) and the doc re-enters fresh — the reference
    test_errors lifecycle (d1_sync.py:110-133)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("error_cnt", T.IntegerType()),
            T.StructField("skip_cnt", T.IntegerType()),
        ]
    )
    ledger = spark.createDataFrame([], schema)
    errored = spark.createDataFrame([(1,)], "id long")
    seen = []
    for run in range(7):
        out = INC.quarantine_fold(
            ledger, errored, allowed_errors=2, skip_runs=3
        )
        rows = out.collect()
        seen.append(
            (rows[0]["error_cnt"], rows[0]["skip_cnt"], rows[0]["skipped"])
            if rows
            else None
        )
        ledger = out.select("id", "error_cnt", "skip_cnt")
    assert seen == [
        (1, 0, False),  # enters the ledger
        (2, 0, False),  # budget builds (error_cnt >= allowed next run)
        (2, 1, True),  # at budget: skipped, skip window opens
        (2, 2, True),
        (2, 3, True),
        None,  # skip_cnt >= skip_runs: entry expires (dropped)
        (1, 0, False),  # re-enters fresh: retried
    ]


def test_quarantine_clears_on_success(spark):
    """A successful refetch drops the ledger entry immediately — errors
    must not accumulate across unrelated runs (d1_sync.py:111-117)."""
    ledger = spark.createDataFrame(
        [(1, 2, 0), (2, 1, 0)], "id long, error_cnt int, skip_cnt int"
    )
    errored = spark.createDataFrame([(2,)], "id long")  # doc 1 recovered
    out = {r["id"]: r.asDict() for r in INC.quarantine_fold(ledger, errored).collect()}
    assert 1 not in out  # cleared on success
    assert out[2]["error_cnt"] == 2 and not out[2]["skipped"]
