"""Structured Streaming: stream-batch parity + exactly-once merge.

Parity tier: the streaming tumbling/session aggregations over the
driver's events table must equal the same aggregation run in batch —
the streaming twin of Q29/Q30. Merge tier: the AvailableNow upsert
stream consumes files exactly once per checkpoint and converges to the
batch upsert result; re-activation with no new files is a no-op.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eea_crawler_spark.sources.tables import load_table
from eea_crawler_spark.streaming import pipeline as SP

ENVELOPE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("indexed_at", T.TimestampType()),
    ]
)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    """Events re-materialized as micro-batch files with proper μs ts."""
    out = str(tmp_path / "events_in")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(out)
    return out


def test_tumbling_stream_equals_batch(spark, sf_dir, events_stream_dir):
    events = load_table(spark, sf_dir, "events")
    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = SP.run_stream_to_memory(SP.tumbling_counts(stream), "tumbling_t")
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"]): r["cnt"]
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    want = {
        (r["win_start"], r["event_type"]): r["cnt"]
        for r in SP.tumbling_counts(events).collect()
    }
    assert got == want and len(want) > 0


def test_session_stream_equals_batch(spark, sf_dir, events_stream_dir):
    events = load_table(spark, sf_dir, "events")
    stream = spark.readStream.schema(events.schema).parquet(events_stream_dir)
    q = SP.run_stream_to_memory(SP.session_counts(stream), "session_t")
    q.awaitTermination(120)
    got = {
        (r["sess_start"], r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_t").collect()
    }
    want = {
        (r["sess_start"], r["user_id"]): r["n_events"]
        for r in SP.session_counts(events).collect()
    }
    assert got == want and len(want) > 0


def test_incremental_upsert_stream(spark, tmp_path):
    src = tmp_path / "src"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    b1 = spark.createDataFrame(
        [("a", "v1", _ts(1)), ("b", "v1", _ts(1))], ENVELOPE
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    q = SP.incremental_upsert_stream(
        spark, str(src), state, ckpt, ENVELOPE
    )
    q.awaitTermination(120)
    got = {r["id"]: r["payload"] for r in spark.read.parquet(state).collect()}
    assert got == {"a": "v1", "b": "v1"}

    # second activation: an update for a, a new doc c — exactly-once
    # (b1's files are not reprocessed thanks to the checkpoint), and the
    # merge keeps the newest version per id
    b2 = spark.createDataFrame(
        [("a", "v2", _ts(2)), ("c", "v1", _ts(2))], ENVELOPE
    )
    b2.coalesce(1).write.mode("append").parquet(str(src))
    q = SP.incremental_upsert_stream(spark, str(src), state, ckpt, ENVELOPE)
    q.awaitTermination(120)
    got = {r["id"]: r["payload"] for r in spark.read.parquet(state).collect()}
    assert got == {"a": "v2", "b": "v1", "c": "v1"}

    # third activation with nothing new: state unchanged (idempotent)
    q = SP.incremental_upsert_stream(spark, str(src), state, ckpt, ENVELOPE)
    q.awaitTermination(120)
    got2 = {r["id"]: r["payload"] for r in spark.read.parquet(state).collect()}
    assert got2 == got


def test_state_merge_stale_update_ignored(spark, tmp_path):
    """Out-of-order delivery: an older stamp must not overwrite newer
    state (last-write-wins by order_col, reference upsert semantics)."""
    state = str(tmp_path / "state2")
    fresh = spark.createDataFrame([("a", "new", _ts(5))], ENVELOPE)
    SP.state_merge(spark, state, fresh)
    stale = spark.createDataFrame([("a", "old", _ts(3))], ENVELOPE)
    SP.state_merge(spark, state, stale)
    got = spark.read.parquet(state).collect()
    assert len(got) == 1 and got[0]["payload"] == "new"


def test_streaming_quarantine_stateful_fold(spark, tmp_path):
    """applyInPandasWithState ledger: state survives across activations
    and matches the batch quarantine_fold transition per failure run."""
    in_dir = tmp_path / "failures_in"
    ckpt = str(tmp_path / "ckpt_q")
    in_dir.mkdir()
    schema = "id string"

    def drain(name):
        # foreachBatch sink: the memory sink cannot resume a checkpoint
        got = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                got[r["id"]] = r.asDict()

        stream = spark.readStream.schema(schema).parquet(str(in_dir))
        ledger = SP.streaming_quarantine(stream, allowed_errors=2, skip_runs=3)
        q = (
            ledger.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    # run 1: d1 fails twice, d2 once — nobody over budget yet
    spark.createDataFrame([("d1",), ("d1",), ("d2",)], schema).write.mode(
        "append"
    ).parquet(str(in_dir))
    led = drain("q_run1")
    assert led["d1"]["error_cnt"] == 2 and not led["d1"]["skipped"]
    assert led["d2"]["error_cnt"] == 1 and not led["d2"]["skipped"]

    # run 2: d1 fails again → over allowed_errors=2 → skipped
    # (state restored from the checkpoint, not recomputed)
    spark.createDataFrame([("d1",)], schema).write.mode("append").parquet(
        str(in_dir)
    )
    led = drain("q_run2")
    # at budget: error_cnt freezes at allowed_errors, skip window opens
    # (reference checks error_cnt >= allowed BEFORE incrementing)
    assert led["d1"]["error_cnt"] == 2 and led["d1"]["skipped"]
    assert led["d1"]["skip_cnt"] == 1
    assert "d2" not in led  # update mode: untouched keys not re-emitted

    # run 3: two more skipped failures → skip budget (3) exhausted
    spark.createDataFrame([("d1",), ("d1",)], schema).write.mode(
        "append"
    ).parquet(str(in_dir))
    led = drain("q_run3")
    assert led["d1"]["skip_cnt"] == 3 and led["d1"]["skipped"]

    # run 4: budget expiry → ledger entry reset, doc retried
    # (reference: entry deleted once skip_cnt >= skip_doc_cnt,
    # d1_sync.py:125-127)
    spark.createDataFrame([("d1",)], schema).write.mode("append").parquet(
        str(in_dir)
    )
    led = drain("q_run4")
    assert led["d1"]["error_cnt"] == 0 and not led["d1"]["skipped"]
    assert led["d1"]["skip_cnt"] == 0


def test_incremental_upsert_stream_on_mor(spark, tmp_path, monkeypatch):
    """The AvailableNow exactly-once stream with a merge-on-read state
    table: each activation's foreachBatch merge appends a segment
    (never rewrites the state), and the resolved view matches the
    copy-on-write run above batch for batch."""
    from eea_crawler_spark.sinks import lakehouse as LK

    monkeypatch.setattr(LK, "MOR_COMPACT_FRACTION", 1e9)
    src = tmp_path / "src"
    state = str(tmp_path / "state_mor")
    ckpt = str(tmp_path / "ckpt_mor")
    src.mkdir()

    b1 = spark.createDataFrame(
        [("a", "v1", _ts(1)), ("b", "v1", _ts(1))], ENVELOPE
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))
    q = SP.incremental_upsert_stream(
        spark, str(src), state, ckpt, ENVELOPE, backend="mor"
    )
    q.awaitTermination(120)
    got = {r["id"]: r["payload"] for r in LK.read_table(spark, state).collect()}
    assert got == {"a": "v1", "b": "v1"} and LK.is_mor_table(state)

    b2 = spark.createDataFrame(
        [("a", "v2", _ts(2)), ("c", "v1", _ts(2))], ENVELOPE
    )
    b2.coalesce(1).write.mode("append").parquet(str(src))
    q = SP.incremental_upsert_stream(
        spark, str(src), state, ckpt, ENVELOPE, backend="mor"
    )
    q.awaitTermination(120)
    got = {r["id"]: r["payload"] for r in LK.read_table(spark, state).collect()}
    assert got == {"a": "v2", "b": "v1", "c": "v1"}
    assert len(LK._mor_segments(state)) == 1  # b2 appended, base untouched

    # compact_table (the OPTIMIZE twin): fold now, view unchanged; the
    # fold lives at the NEW base epoch the spec points to (the stale
    # epoch-0 top level is retained one cycle for in-flight readers)
    LK.compact_table(spark, state)
    assert LK._mor_segments(state) == []
    spec = LK._mor_spec(state)
    assert spec["base"] is not None
    plain = {
        r["id"]: r["payload"]
        for r in spark.read.parquet(
            LK._mor_base_location(state, spec)
        ).collect()
    }
    assert plain == got


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's state protocol needs google.protobuf "
    "(absent in this container, no network route — BASELINE.md); the "
    "operator is env-gated like the delta-spark legs",
)
def test_streaming_quarantine_tws_parity(spark, tmp_path):
    """transformWithStateInPandas twin: same transition, same output as
    streaming_quarantine across multi-activation state restore."""
    in_dir = tmp_path / "failures_tws"
    in_dir.mkdir()
    schema = "id string"

    def drain(op, ckpt):
        got = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                got[r["id"]] = r.asDict()

        stream = spark.readStream.schema(schema).parquet(str(in_dir))
        ledger = op(stream, allowed_errors=2, skip_runs=3)
        q = (
            ledger.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    ck_a = str(tmp_path / "ckpt_a")
    ck_b = str(tmp_path / "ckpt_b")
    # activation 1: d1 twice, d2 once; activation 2: d1 once (over
    # budget), d3 new — both operators replay the same files
    spark.createDataFrame(
        [("d1",), ("d1",), ("d2",)], schema
    ).write.mode("append").parquet(str(in_dir))
    a1 = drain(SP.streaming_quarantine, ck_a)
    b1 = drain(SP.streaming_quarantine_tws, ck_b)
    assert b1 == a1 and a1["d1"]["error_cnt"] == 2

    spark.createDataFrame([("d1",), ("d3",)], schema).write.mode(
        "append"
    ).parquet(str(in_dir))
    a2 = drain(SP.streaming_quarantine, ck_a)
    b2 = drain(SP.streaming_quarantine_tws, ck_b)
    assert b2 == a2
    assert a2["d1"]["skipped"] and a2["d3"]["error_cnt"] == 1
