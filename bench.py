#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line with per-query wall-clock.

Runs every declared query (SURVEY.md §2.9) at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``; each
query is planned and fully executed (count-collapsed via a no-op sink
``df.write.format("noop")``) after a warm-up pass of the same plan so the
number reflects steady-state execution, not JVM warm-up.

Each query's reported time is the MEDIAN of ``$SPARK_GRAFT_BENCH_REPS``
(default 3) timed executions — round 2's numbers drifted ~1.5× on
untouched trivial scans from run-to-run noise on a loaded box; the
median keeps one slow run from polluting the recorded number.

Output: {"metric": "total_query_sec", "value": N, "unit": "sec",
         "queries": {"q1": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eea_crawler_spark.session import get_spark  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def run_query(df) -> None:
    # noop sink executes the whole plan without driver-side materialization
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") == "1"
    # measured numbers keep the fixed pre-touched heap regardless of SF:
    # this sandbox demand-faults fresh pages at ~100 MB/s and a lazily
    # growing heap turns G1 expansions into multi-second stragglers in
    # whichever timed query they land on (session.py gates the pre-touch
    # by input size for ordinary/test sessions; the bench pins it on)
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    # shuffle partitions + AQE sized to the benchmark input (see session.py)
    spark = get_spark("eea_crawler_spark-bench", data_dir=sf_dir)

    from eea_crawler_spark.plans import CORE_QUERIES, QUERIES
    from eea_crawler_spark.sources.tables import cache_tables

    # the extras re-scan documents/embeddings once per query; cache the
    # two hot tables so their numbers measure the operator, not the
    # repeated parquet scan (core q1-q32 keep cold scans — their
    # contract is scan-inclusive)
    cache_tables(spark, sf_dir, ("documents", "embeddings"))

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    if warmup:
        # one full pass to warm codegen/JIT and the file-listing caches
        for name, fn in QUERIES.items():
            run_query(fn(spark, sf_dir))
    # reps are interleaved as full passes over all queries: this host
    # has multi-second noisy-neighbor bursts, and with back-to-back
    # reps one burst poisons every sample of whichever query it lands
    # on (median reads as a fake 3-10x regression). Spacing a query's
    # reps minutes apart keeps its median/min burst-robust.
    for _ in range(reps):
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            run_query(fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            # drop the rep plan's references so ContextCleaner can
            # release its localCheckpoint blocks — without this the
            # session accumulates every rep's checkpointed RDDs and
            # later queries pay the GC pressure of the whole run
            # (median ≫ best); the collect itself is untimed
            gc.collect()
    timings = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    # best-of-reps rides along so a noisy-neighbor window on one rep
    # is visible as (median >> best) instead of reading as a plan
    # regression
    best = {n: round(min(s), 4) for n, s in samples.items()}

    # headline metric covers the declared core set (BASELINE.md contract);
    # extras are still reported per-query above
    total = round(sum(t for n, t in timings.items() if n in CORE_QUERIES), 4)
    total_best = round(
        sum(t for n, t in best.items() if n in CORE_QUERIES), 4
    )
    # Declared noise band (BASELINE.md "bench noise discipline"): this
    # firecracker host has noisy-neighbor steal windows that swing
    # identical code 1.5-3x, so round-over-round drift is judged on
    # BEST-of-interleaved-reps vs the rolling best core total with a
    # ±15% tolerance — a run is only a regression when even its best
    # pass falls outside the band. Update the rolling best when a
    # better window is recorded.
    # 7.8946 = BENCH_r11 core best (beat the prior 7.94 anchor;
    # round-11 verdict #5 / round-12 housekeeping)
    rolling_best = float(
        os.environ.get("SPARK_GRAFT_ROLLING_BEST_CORE_SEC", "7.8946")
    )
    band = {
        "core_total_median_sec": total,
        "core_total_best_sec": total_best,
        "rolling_best_core_sec": rolling_best,
        "tolerance_pct": 15,
        "within_band": bool(total_best <= rolling_best * 1.15),
    }
    # the one-line JSON contract: print it as the FINAL stdout line with
    # nothing after it (round-13 verdict #8 — BENCH_r12 recorded rc=0 but
    # parsed null, costing that round its official comparison; teardown
    # noise after the JSON is the only plausible culprit since the line
    # itself was present in the tail). Teardown therefore runs BEFORE the
    # print and is exception-guarded so a cleanup failure cannot eat the
    # result; numbers and methodology are unchanged.
    result_line = json.dumps(
        {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "queries_best": best,
            "noise_band": band,
            "sf": _sf_of(sf_dir),
        }
    )
    try:
        from eea_crawler_spark.sources.tables import clear_table_cache

        clear_table_cache()
        spark.stop()
    except Exception as e:  # pragma: no cover - teardown only
        print(f"teardown warning: {e}", file=sys.stderr)
    print(result_line, flush=True)


if __name__ == "__main__":
    main()
