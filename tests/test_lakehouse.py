"""Backend-parametrized merge semantics (sinks.lakehouse).

The same last-wins upsert / keyed delete contract must hold on both
backends: the parquet swap emulation (always runnable here) and Delta
``MERGE INTO`` (runs only where delta-spark is importable and the
session carries the Delta extension — skipped otherwise, so a lakehouse
runtime exercises the real DML path with zero test changes).
"""

from __future__ import annotations

import datetime as dt

import pytest

from eea_crawler_spark.sinks import lakehouse as LK

# (backend, parquet merge strategy): the broadcast small-batch plan must
# be semantics-identical to the window plan — same five contracts run
# over both; delta ignores strategy (MERGE INTO).
MODES = [("parquet", "window"), ("parquet", "broadcast"), ("delta", "window")]


def _needs(spark, backend):
    if backend == "delta" and not LK.delta_available(spark):
        pytest.skip("delta-spark not available in this session")


def _rows(spark, path):
    return {
        r["id"]: (r["v"], r["indexed_at"])
        for r in LK.read_table(spark, path).collect()
    }


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, v, dt.datetime(2024, 1, d)) for i, v, d in rows],
        "id string, v string, indexed_at timestamp",
    )


@pytest.mark.parametrize("backend,strategy", MODES)
def test_merge_upsert_last_wins(spark, tmp_path, backend, strategy):
    _needs(spark, backend)
    path = str(tmp_path / "t")
    LK.merge_upsert(spark, path, _df(spark, [("a", "v1", 1), ("b", "v1", 1)]), backend=backend, strategy=strategy)
    # update a (newer), insert c; stale update for b is ignored
    LK.merge_upsert(
        spark,
        path,
        _df(spark, [("a", "v2", 2), ("c", "v1", 2)]),
        backend=backend,
        strategy=strategy,
    )
    LK.merge_upsert(spark, path, _df(spark, [("b", "stale", 1)]), backend=backend, strategy=strategy)
    got = _rows(spark, path)
    assert got["a"][0] == "v2" and got["c"][0] == "v1"
    # equal-timestamp update wins (idempotent re-apply), so "stale" at
    # the SAME stamp replaces — but an older stamp must not:
    LK.merge_upsert(spark, path, _df(spark, [("a", "old", 1)]), backend=backend, strategy=strategy)
    assert _rows(spark, path)["a"][0] == "v2"


@pytest.mark.parametrize("backend,strategy", MODES)
def test_merge_upsert_within_batch_dedup(spark, tmp_path, backend, strategy):
    _needs(spark, backend)
    path = str(tmp_path / "t")
    LK.merge_upsert(
        spark,
        path,
        _df(spark, [("a", "first", 1), ("a", "last", 3), ("a", "mid", 2)]),
        backend=backend,
        strategy=strategy,
    )
    assert _rows(spark, path)["a"][0] == "last"


@pytest.mark.parametrize("backend,strategy", MODES)
def test_merge_delete(spark, tmp_path, backend, strategy):
    _needs(spark, backend)
    path = str(tmp_path / "t")
    LK.merge_upsert(
        spark,
        path,
        _df(spark, [("a", "v", 1), ("b", "v", 1), ("c", "v", 1)]),
        backend=backend,
        strategy=strategy,
    )
    doomed = spark.createDataFrame([("b",), ("zz",)], "id string")
    LK.merge_delete(spark, path, doomed, backend=backend)
    assert set(_rows(spark, path)) == {"a", "c"}


@pytest.mark.parametrize("backend,strategy", MODES)
def test_merge_schema_evolution(spark, tmp_path, backend, strategy):
    """Batches adding or omitting columns merge on BOTH backends: the
    parquet twin unions with allowMissingColumns, the Delta leg must
    carry withSchemaEvolution/autoMerge (round-3 divergence: it threw
    on a real Delta runtime while parquet succeeded)."""
    _needs(spark, backend)
    path = str(tmp_path / "t")
    LK.merge_upsert(spark, path, _df(spark, [("a", "v1", 1)]), backend=backend, strategy=strategy)
    # batch ADDS a column the table lacks
    wider = spark.createDataFrame(
        [("b", "v1", dt.datetime(2024, 1, 2), "extra")],
        "id string, v string, indexed_at timestamp, nlp string",
    )
    LK.merge_upsert(spark, path, wider, backend=backend, strategy=strategy)
    # batch OMITS a column the table has (update-only renormalize shape)
    narrower = spark.createDataFrame(
        [("a", "v2", dt.datetime(2024, 1, 3))],
        "id string, v string, indexed_at timestamp",
    )
    LK.merge_upsert(spark, path, narrower, backend=backend, strategy=strategy)
    got = {r["id"]: r.asDict() for r in LK.read_table(spark, path).collect()}
    assert got["a"]["v"] == "v2" and got["a"]["nlp"] is None
    assert got["b"]["nlp"] == "extra"


@pytest.mark.parametrize("backend,strategy", MODES)
def test_merge_idempotent_replay(spark, tmp_path, backend, strategy):
    """At-least-once safety: re-applying the same batch is a no-op."""
    _needs(spark, backend)
    path = str(tmp_path / "t")
    batch = _df(spark, [("a", "v1", 1), ("b", "v1", 1)])
    LK.merge_upsert(spark, path, batch, backend=backend, strategy=strategy)
    before = _rows(spark, path)
    LK.merge_upsert(spark, path, batch, backend=backend, strategy=strategy)
    assert _rows(spark, path) == before
