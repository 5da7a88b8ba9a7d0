"""Structured Streaming surface: incremental sync + windowed analytics.

The reference's "streaming" is cron micro-batching — full sync daily,
quick sync every 5 minutes (``dags/variables.json:114-115``), each run
an idempotent keyed upsert (``search_pipeline.conf:14-27``). The
idiomatic Spark translation (SURVEY §2.8):

  - ``Trigger.AvailableNow`` file-source streams for the quick-sync
    cadence: each activation drains whatever arrived, exactly-once per
    checkpoint, then stops — cron without cron drift.
  - ``foreachBatch`` + keyed last-wins merge for the upsert sink. On a
    lakehouse this is Delta ``MERGE INTO``; here the merge is emulated
    on plain parquet (read state → upsert → atomic directory swap) so
    the semantics are testable in this environment.
  - watermarked tumbling windows and session windows for the
    event-analytics shapes the batch engine declares as Q29/Q30 — the
    streaming twin of the same aggregation, verified against the batch
    result in tests (stream-batch parity).

Scale: file-source streams shard by file; the merge shuffles once on
the id (uniform key). Watermark state is bounded by (keys × window),
evicted as the watermark advances.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def state_merge(
    spark: SparkSession,
    state_path: str,
    updates: DataFrame,
    key: str = "id",
    order_col: str = "indexed_at",
    backend: str = "auto",
) -> None:
    """Keyed last-wins merge of ``updates`` into a state table.

    Backend-dispatched (sinks.lakehouse): Delta ``MERGE INTO`` when the
    runtime has delta-spark — transactional, touches O(changed files) —
    else the plain-parquet emulation (read current state, upsert, write
    alongside, swap the directory). The swap is what Delta's transaction
    log does properly; the parquet version is crash-safe only up to the
    rename and exists so the merge *semantics* are testable without a
    lakehouse runtime.
    """
    from eea_crawler_spark.sinks.lakehouse import merge_upsert

    merge_upsert(
        spark, state_path, updates, key=key, order_col=order_col,
        backend=backend,
    )


def incremental_upsert_stream(
    spark: SparkSession,
    source_path: str,
    state_path: str,
    checkpoint_path: str,
    schema,
    key: str = "id",
    order_col: str = "indexed_at",
    backend: str = "auto",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Quick-sync as a stream: drain new files, merge by id, stop.

    ``AvailableNow`` + checkpoint gives exactly-once file consumption
    across activations; the merge inside foreachBatch is idempotent
    (last-wins), so the pipeline is safe under batch replay too.
    ``max_files_per_trigger`` slices the drain into several micro-batch
    merges (without it AvailableNow takes everything discovered in ONE
    batch — one bulk merge, not the incremental per-batch shape).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_path)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        state_merge(
            batch_df.sparkSession, state_path, batch_df, key=key,
            order_col=order_col, backend=backend,
        )

    return (
        src.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Q30's tumbling aggregation, streaming form: watermarked window
    groupBy (works on both stream and batch DataFrames)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "cnt",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Q29's sessionization, streaming form: built-in session_window
    (stateful gap-based sessions, watermark-evicted)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            "user_id",
            "n_events",
        )
    )


def run_stream_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> StreamingQuery:
    """Drain a finite stream into an in-memory table (test harness)."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


# ---- custom stateful operator: streaming quarantine ledger (A7) ---------

QUARANTINE_STATE_SCHEMA = "error_cnt int, skip_cnt int"
QUARANTINE_OUT_SCHEMA = (
    "id string, error_cnt int, skip_cnt int, skipped boolean"
)


def _quarantine_transition(
    n_new: int,
    in_ledger: bool,
    error_cnt: int,
    skip_cnt: int,
    allowed_errors: int,
    skip_runs: int,
) -> tuple[int, int, bool, bool]:
    """The reference's per-run error-budget transition
    (d1_sync.py:110-133), applied ``n_new`` times — THE shared fold of
    the batch quarantine, the applyInPandasWithState operator, and the
    transformWithStateInPandas twin (one function so they cannot
    drift). Returns (error_cnt, skip_cnt, skipped, in_ledger)."""
    skipped = False
    for _ in range(n_new):
        if not in_ledger:  # new entry (d1_sync.py:121-124)
            error_cnt, skip_cnt, skipped, in_ledger = 1, 0, False, True
        elif error_cnt >= allowed_errors:  # at budget (:126)
            if skip_cnt >= skip_runs:  # expiry → evict, retry (:127-128)
                error_cnt, skip_cnt, skipped, in_ledger = 0, 0, False, False
            else:
                skip_cnt += 1
                skipped = True
        else:
            error_cnt += 1
            skipped = False
    return error_cnt, skip_cnt, skipped, in_ledger


def streaming_quarantine(
    failures: DataFrame,
    allowed_errors: int = 2,
    skip_runs: int = 100,
    id_col: str = "id",
) -> DataFrame:
    """The error-budget fold (A7, d1_sync.py:82-140) as a custom
    stateful streaming operator via ``applyInPandasWithState`` — the
    reference kept this state in an Airflow Variable re-read every run;
    here it lives in the streaming state store, checkpointed and
    restored across activations.

    Per doc id, each failure event is one errored run in the reference's
    transition (d1_sync.py:110-133): below budget the event increments
    ``error_cnt``; at budget (``error_cnt >= allowed_errors``) the doc
    is ``skipped`` and ``skip_cnt`` counts the skipped runs; once
    ``skip_cnt >= skip_runs`` the entry expires — state evicted, doc
    retried fresh — identical transition function to the batch
    ``quarantine_fold``, which the tests pin via stream/batch parity.

    State is bounded: one (int, int) pair per failing doc id, evicted
    on reset. Scale: the groupBy shuffles only failure events (rare),
    never the corpus.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        n_new = sum(len(p) for p in pdfs)
        if state.exists:
            error_cnt, skip_cnt = state.get
            in_ledger = True
        else:
            error_cnt, skip_cnt = 0, 0
            in_ledger = False
        error_cnt, skip_cnt, skipped, in_ledger = _quarantine_transition(
            n_new, in_ledger, error_cnt, skip_cnt, allowed_errors, skip_runs
        )
        if in_ledger:
            state.update((error_cnt, skip_cnt))
        elif state.exists:  # evicted on expiry: bounded state
            state.remove()
        yield pd.DataFrame(
            {
                "id": [key[0]],
                "error_cnt": [error_cnt],
                "skip_cnt": [skip_cnt],
                "skipped": [skipped],
            }
        )

    return failures.groupBy(F.col(id_col)).applyInPandasWithState(
        fold,
        outputStructType=QUARANTINE_OUT_SCHEMA,
        stateStructType=QUARANTINE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quarantine_tws(
    failures: DataFrame,
    allowed_errors: int = 2,
    skip_runs: int = 100,
    id_col: str = "id",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of ``streaming_quarantine``
    (Spark 4's arbitrary-state API) — identical transition
    (``_quarantine_transition``, the single shared fold), identical
    output schema, state as a named ValueState in the RocksDB store.

    Why it exists: the round-9 dense-quarantine measurement put the
    applyInPandasWithState wall at the per-key Python round trip
    (~35 µs/key); this twin measures whether the newer API's state
    protocol moves that wall (bench_streaming.py --quarantine-op tws
    records the comparison — see BASELINE.md for the adjudication).
    transformWithState REQUIRES the RocksDB state store provider; this
    function sets that session conf (streaming state store only — batch
    plans never read it; the HDFS-backed default stores for OTHER
    running streams are unaffected, each query pins its provider at
    start).

    ENVIRONMENT SEAM: the tWS state protocol speaks protobuf between
    the Python workers and the JVM state server; this container has no
    ``google.protobuf`` and no network route to install it (logged in
    BASELINE.md, same class as the delta-spark legs), so the query
    fails at driver-worker init here. The operator and its parity test
    (env-gated) are complete; ``streaming_quarantine`` carries the
    contract in this environment."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    failures.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    class _Quarantine(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ledger = handle.getValueState(
                "ledger", QUARANTINE_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            n_new = sum(len(p) for p in rows)
            if self._ledger.exists():
                error_cnt, skip_cnt = self._ledger.get()
                in_ledger = True
            else:
                error_cnt, skip_cnt, in_ledger = 0, 0, False
            error_cnt, skip_cnt, skipped, in_ledger = (
                _quarantine_transition(
                    n_new, in_ledger, error_cnt, skip_cnt,
                    allowed_errors, skip_runs,
                )
            )
            if in_ledger:
                self._ledger.update((error_cnt, skip_cnt))
            elif self._ledger.exists():  # evicted on expiry
                self._ledger.clear()
            yield pd.DataFrame(
                {
                    "id": [key[0]],
                    "error_cnt": [error_cnt],
                    "skip_cnt": [skip_cnt],
                    "skipped": [skipped],
                }
            )

        def close(self) -> None:
            pass

    return failures.groupBy(F.col(id_col)).transformWithStateInPandas(
        statefulProcessor=_Quarantine(),
        outputStructType=QUARANTINE_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
