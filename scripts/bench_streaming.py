#!/usr/bin/env python
"""Structured Streaming throughput: the §2.8 surface measured, not just
parity-tested.

Three walls, all through the production entry points
(`streaming/pipeline.py`) with `Trigger.AvailableNow` — the quick-sync
cadence shape — on local[32]:

  1. ``tumbling``  — watermarked tumbling window counts over the sf10
     events table (10M rows) streamed from files, noop sink.
  2. ``session``   — session_window counts over the same stream
     (stateful gap sessions; state = users × open sessions).
  3. ``ingest``    — ``incremental_upsert_stream``: N update batches
     drained into a bucketed MOR state via foreachBatch keyed merges
     (exactly-once per checkpoint), docs/s end-to-end.

Usage: python scripts/bench_streaming.py [--events-sf-dir .scale/sf10]
       [--ingest-docs 1000000] [--ingest-batches 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--events-sf-dir", default=os.path.join(REPO, ".scale", "sf10")
    )
    ap.add_argument("--ingest-docs", type=int, default=1_000_000)
    ap.add_argument("--ingest-batches", type=int, default=10)
    ap.add_argument("--quarantine-ids", type=int, default=1_000_000)
    ap.add_argument("--quarantine-batches", type=int, default=10)
    ap.add_argument(
        "--quarantine-op", default="apws", choices=["apws", "tws"],
        help="apws = applyInPandasWithState (default); tws = the "
        "transformWithStateInPandas twin (needs google.protobuf — "
        "environment-blocked in this container, see BASELINE.md)",
    )
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.streaming import pipeline as SP
    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.sources.tables import load_table

    spark = get_spark("stream-bench", data_dir=args.events_sf_dir)
    work = tempfile.mkdtemp(prefix="stream_bench_")
    out = {}

    # ---- windowed analytics over the events stream -------------------
    ev_dir = os.path.join(work, "events_in")
    events = load_table(spark, args.events_sf_dir, "events")
    n_events = events.count()
    events.repartition(32).write.parquet(ev_dir)
    schema = spark.read.parquet(ev_dir).schema

    def drain(df, name):
        t0 = time.perf_counter()
        q = (
            df.writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, f"ckpt_{name}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return round(time.perf_counter() - t0, 2)

    stream = spark.readStream.schema(schema).parquet(ev_dir)
    t = drain(SP.tumbling_counts(stream), "tumbling")
    out["tumbling_sec"] = t
    out["tumbling_rows_per_sec"] = int(n_events / t)
    stream = spark.readStream.schema(schema).parquet(ev_dir)
    t = drain(SP.session_counts(stream), "session")
    out["session_sec"] = t
    out["session_rows_per_sec"] = int(n_events / t)
    out["n_events"] = n_events

    # ---- incremental upsert ingest into a bucketed MOR state ---------
    src_dir = os.path.join(work, "updates_in")
    os.makedirs(src_dir)
    base = (
        spark.range(args.ingest_docs)
        .select(
            F.concat(F.lit("doc/"), F.col("id")).alias("id"),
            F.sha2(F.col("id").cast("string"), 256).alias("v"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("indexed_at"),
        )
    )
    # batch boundaries cover the full id range (last batch takes the
    # remainder); each batch coalesces to FILES_PER_BATCH files so
    # maxFilesPerTrigger below slices the drain into one micro-batch
    # merge per logical batch — without the slicing AvailableNow takes
    # everything in ONE batch and the number measures a single bulk
    # merge instead of the incremental path
    FILES_PER_BATCH = 4
    per_batch = -(-args.ingest_docs // args.ingest_batches)  # ceil
    for b in range(args.ingest_batches):
        lo, hi = b * per_batch, min((b + 1) * per_batch, args.ingest_docs)
        if lo >= hi:
            continue
        (
            base.filter(
                (F.col("id").substr(5, 99).cast("long") >= lo)
                & (F.col("id").substr(5, 99).cast("long") < hi)
            )
            .coalesce(FILES_PER_BATCH)
            .write.parquet(os.path.join(src_dir, f"batch_{b:03d}"))
        )
    state = os.path.join(work, "state")
    # seed the MOR layout (bucketed) so every streamed merge is O(batch)
    from eea_crawler_spark.sinks import lakehouse as LK

    LK.merge_upsert(
        spark, state, base.limit(0), key="id", order_col="indexed_at",
        backend="mor", n_buckets=32,
    )
    t0 = time.perf_counter()
    q = SP.incremental_upsert_stream(
        spark,
        os.path.join(src_dir, "*"),
        state,
        os.path.join(work, "ckpt_ingest"),
        base.schema,
        backend="mor",
        max_files_per_trigger=FILES_PER_BATCH,
    )
    q.awaitTermination()
    t = round(time.perf_counter() - t0, 2)
    n_state = LK.read_table(spark, state).count()
    assert n_state == args.ingest_docs, (n_state, args.ingest_docs)
    out["ingest_sec"] = t
    out["ingest_docs_per_sec"] = int(args.ingest_docs / t)
    out["ingest_docs"] = args.ingest_docs

    # ---- stateful quarantine ledger: 1M tracked ids, 10 activations --
    # (round-8 VERDICT #7: §2.8's applyInPandasWithState operator gets a
    # measured state-store record.) Every activation delivers one
    # failure event for EVERY tracked id, so each micro-batch folds the
    # transition over the full 1M-entry state store — the worst-case
    # activation shape (a real sweep's failure set is sparse).
    q_src = os.path.join(work, "quar_in")
    os.makedirs(q_src)
    fail = spark.range(args.quarantine_ids).select(
        F.concat(F.lit("doc/"), F.col("id")).alias("id")
    )
    for b in range(args.quarantine_batches):
        fail.coalesce(4).write.parquet(os.path.join(q_src, f"b{b:03d}"))
    qstream = (
        spark.readStream.schema("id string")
        .option("maxFilesPerTrigger", 4)
        .parquet(os.path.join(q_src, "*"))
    )
    q_op = (
        SP.streaming_quarantine_tws
        if args.quarantine_op == "tws"
        else SP.streaming_quarantine
    )
    t0 = time.perf_counter()
    q = (
        q_op(qstream)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt_quar"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t = round(time.perf_counter() - t0, 2)
    n_q = args.quarantine_ids * args.quarantine_batches
    out["quarantine_sec"] = t
    out["quarantine_events_per_sec"] = int(n_q / t)
    out["quarantine_tracked_ids"] = args.quarantine_ids
    out["quarantine_activations"] = args.quarantine_batches
    out["quarantine_op"] = args.quarantine_op

    print(json.dumps({"metric": "streaming_bench", **out}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
