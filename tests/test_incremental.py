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
@pytest.mark.slow
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


def test_parts_diff_and_guard_match_resolved_view(spark, tmp_path):
    """sync_diff_parts / guarded_deletes_parts over a segmented MOR
    state must equal sync_diff / guarded_deletes over the RESOLVED view
    — randomized state history (upserts, stale updates, tombstones) and
    a listing mixing new / changed / unchanged / err-retry / unlisted
    ids, seeded for reproducibility."""
    import datetime as dt
    import random

    from eea_crawler_spark.sinks import lakehouse as LK

    rng = random.Random(13)
    path = str(tmp_path / "raw")
    LK.MOR_COMPACT_FRACTION, saved = 1e9, LK.MOR_COMPACT_FRACTION
    try:
        def df(rows):
            return spark.createDataFrame(
                [
                    (f"u{i}", f"2024-01-{m:02d}", ["boom"] if e else [],
                     dt.datetime(2024, 1, d))
                    for i, m, e, d in rows
                ],
                "id string, modified string, errors array<string>, "
                "indexed_at timestamp",
            )

        ids = list(range(40))
        LK.merge_upsert(
            spark, path,
            df([(i, 1, i % 7 == 0, 1) for i in ids]),
            key="id", order_col="indexed_at", backend="mor",
        )
        for day in (2, 3):  # two segment generations incl. stale rows
            batch = [
                (i, rng.randint(1, 3), rng.random() < 0.2, rng.choice((1, day)))
                for i in rng.sample(ids, 12)
            ]
            LK.merge_upsert(
                spark, path, df(batch), key="id", order_col="indexed_at",
                backend="mor",
            )
        LK.merge_delete(
            spark, path,
            spark.createDataFrame(
                [(f"u{i}",) for i in rng.sample(ids, 5)], "id string"
            ),
            backend="mor",
        )
        assert LK._mor_segments(path)  # the split path is actually live

        listing = spark.createDataFrame(
            [
                (f"u{i}", "Document", f"2024-01-{rng.randint(1, 3):02d}", False)
                for i in rng.sample(ids, 30)
            ]
            + [(f"new{i}", "Document", "2024-01-01", False) for i in range(4)],
            "id string, doc_type string, modified string, seo_noindex boolean",
        )
        resolved = LK.read_table(spark, path).select("id", "modified", "errors")
        parts = LK.read_table_parts(spark, path)
        parts = (
            parts[0].select("id", "modified", "errors"),
            parts[1].select("id", "modified", "errors"),
            parts[2],
        )

        want = {
            (r["id"], r["change_type"])
            for r in INC.sync_diff(listing, resolved).collect()
        }
        got = {
            (r["id"], r["change_type"])
            for r in INC.sync_diff_parts(listing, parts).collect()
        }
        assert got == want and want  # non-trivial diff

        cand_w, ok_w, ratio_w = INC.guarded_deletes(resolved, listing)
        cand_g, ok_g, ratio_g = INC.guarded_deletes_parts(parts, listing)
        assert {r["id"] for r in cand_g.collect()} == {
            r["id"] for r in cand_w.collect()
        }
        assert (ok_g, round(ratio_g, 6)) == (ok_w, round(ratio_w, 6))
    finally:
        LK.MOR_COMPACT_FRACTION = saved


def test_fused_sweep_matches_diff_plus_guard(spark, tmp_path):
    """sync_sweep_parts (one full-outer execution) must equal the
    legacy composition — quarantine_filter → sync_diff for the due set,
    preserved-ids guarded_deletes for the candidates/ratio — over a
    segmented MOR state, with filter flags exercising every branch:
    filtered-out listings become deletion candidates, quarantined
    listings are preserved but never fetched, tombstoned state ids
    re-listed come back as 'new'."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from eea_crawler_spark.sinks import lakehouse as LK

    rng = random.Random(29)
    path = str(tmp_path / "raw")
    LK.MOR_COMPACT_FRACTION, saved = 1e9, LK.MOR_COMPACT_FRACTION
    try:
        def sdf(rows):
            return spark.createDataFrame(
                [
                    (f"u{i}", f"2024-01-{m:02d}", ["x"] if e else [],
                     dt.datetime(2024, 1, d))
                    for i, m, e, d in rows
                ],
                "id string, modified string, errors array<string>, "
                "indexed_at timestamp",
            )

        ids = list(range(60))
        LK.merge_upsert(
            spark, path, sdf([(i, 1, i % 9 == 0, 1) for i in ids]),
            key="id", order_col="indexed_at", backend="mor",
        )
        LK.merge_upsert(
            spark, path,
            sdf([(i, rng.randint(1, 3), rng.random() < 0.2, 2)
                 for i in rng.sample(ids, 15)]),
            key="id", order_col="indexed_at", backend="mor",
        )
        LK.merge_delete(
            spark, path,
            spark.createDataFrame(
                [(f"u{i}",) for i in rng.sample(ids, 6)], "id string"
            ),
            backend="mor",
        )
        assert LK._mor_segments(path)

        listed = rng.sample(ids, 45)
        listing_raw = spark.createDataFrame(
            [
                (f"u{i}", "Document", f"2024-01-{rng.randint(1, 3):02d}",
                 rng.random() < 0.15)  # some noindex → filtered out
                for i in listed
            ]
            + [(f"new{i}", "Document", "2024-01-01", False) for i in range(5)],
            "id string, doc_type string, modified string, seo_noindex boolean",
        )
        skip_ids = spark.createDataFrame(
            [(f"u{i}",) for i in rng.sample(listed, 8)], "id string"
        )
        ledger = skip_ids.select(
            "id", F.lit(3).alias("error_cnt"), F.lit(0).alias("skip_cnt"),
            F.lit(True).alias("skipped"),
        )

        # ---- legacy composition over the RESOLVED view
        resolved = LK.read_table(spark, path).select("id", "modified", "errors")
        listing = listing_raw.filter(~F.coalesce("seo_noindex", F.lit(False)))
        fetch_listing = INC.quarantine_filter(listing, ledger)
        want_due = {
            (r["id"], r["change_type"])
            for r in INC.sync_diff(fetch_listing, resolved).collect()
        }
        preserved = listing.select("id").unionByName(
            listing_raw.select("id").join(skip_ids, "id", "left_semi")
        )
        cand_w, ok_w, ratio_w = INC.guarded_deletes(resolved, preserved)
        want_cand = {r["id"] for r in cand_w.collect()}

        # ---- fused sweep over the split parts
        parts = LK.read_table_parts(spark, path)
        parts = (
            parts[0].select("id", "modified", "errors"),
            parts[1].select("id", "modified", "errors")
            if parts[1] is not None else None,
            parts[2],
        )
        passes = ~F.coalesce(F.col("seo_noindex"), F.lit(False))
        q = F.col("__q").isNotNull()
        lf = (
            listing_raw.join(
                F.broadcast(skip_ids.withColumn("__q", F.lit(True))),
                "id", "left",
            )
            .withColumn("__fetchable", passes & ~q)
            .withColumn("__preserved", passes | q)
            .drop("__q")
        )
        due, doomed, errored, n_prev, n_del, ok_g, ratio_g = (
            INC.sync_sweep_parts(lf, parts)
        )
        assert {
            (r["id"], r["change_type"]) for r in due.collect()
        } == want_due and want_due
        assert {r["id"] for r in doomed.collect()} == want_cand and want_cand
        assert n_del == len(want_cand)
        assert (ok_g, round(ratio_g, 6)) == (ok_w, round(ratio_w, 6))
        # errored = every stored (pre-sync) row with errors — the
        # quarantine fold's input, folded into the same corpus join
        want_err = {
            r["id"]
            for r in resolved.filter(F.size("errors") > 0).collect()
        }
        assert {r["id"] for r in errored.collect()} == want_err and want_err

        # duplicate listings fold to ONE due row (id-keyed dict semantics)
        dup = listing_raw.unionByName(listing_raw.limit(10))
        lf2 = (
            dup.join(
                F.broadcast(skip_ids.withColumn("__q", F.lit(True))),
                "id", "left",
            )
            .withColumn("__fetchable", passes & ~q)
            .withColumn("__preserved", passes | q)
            .drop("__q")
        )
        due2 = INC.sync_sweep_parts(lf2, parts)[0]
        assert due2.count() == due2.select("id").distinct().count()
    finally:
        LK.MOR_COMPACT_FRACTION = saved


@pytest.mark.parametrize("cap", [None, 0])
def test_sweep_veto_past_broadcast_cap(spark, monkeypatch, cap):
    """The duplicate-listing veto must not force a broadcast of an
    unbounded candidate set (round-7 ADVICE: a truncated listing makes
    it corpus-sized BEFORE the threshold gets to abort gracefully):
    past ``VETO_BROADCAST_MAX_IDS`` the probes run as plain shuffle
    joins with identical results."""
    if cap is not None:
        monkeypatch.setattr(INC, "VETO_BROADCAST_MAX_IDS", cap)
    state = spark.createDataFrame(
        [(f"s{i}", "m1", []) for i in range(10)],
        "id string, modified string, errors array<string>",
    )
    # s0 listed twice with DISAGREEING flags (one preserved row → veto);
    # s1 listed unpreserved only → candidate; s2..s9 unlisted → doomed
    lf = spark.createDataFrame(
        [
            ("s0", "m1", False, True),
            ("s0", "m1", False, False),
            ("s1", "m1", False, False),
        ],
        "id string, modified string, __fetchable boolean, __preserved boolean",
    )
    due, doomed, _err, n_prev, n_del, allowed, ratio = INC.sync_sweep_parts(
        lf, (state, None, None), force=True
    )
    assert {r["id"] for r in doomed.collect()} == {"s1"} | {
        f"s{i}" for i in range(2, 10)
    }
    assert n_del == 9 and n_prev == 10
