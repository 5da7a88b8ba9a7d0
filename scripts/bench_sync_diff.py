#!/usr/bin/env python
"""Isolate the sync's listing×state legs over an EXISTING 5M-doc state.

`bench_sync_scale.py` times whole sync walls; this probe times just the
two O(corpus) joins VERDICT r6 #1 targets — the J1 diff and the J2/J3
deletion guard — against the state directory the scale bench left
behind, so bucketed-vs-plain state layouts can be A/B'd without
rebuilding 5M docs per sample and without fetch/chain noise.

Reps are interleaved (diff, guard, diff, guard, ...) like bench.py so a
steal window cannot poison one leg's every sample; prints one JSON line
with per-leg medians/bests and whether the state read took the split
(exchange-free) path.

Usage: python scripts/bench_sync_diff.py [--docs 5000000]
         [--state .scale/sync_state] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument(
        "--state", default=os.path.join(REPO, ".scale", "sync_state")
    )
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.operators import incremental as INC
    from eea_crawler_spark.pipeline import _read_state_parts
    from bench_sync_scale import listing_provider

    spark = get_spark("sync-diff-probe", data_dir=None)
    raw = os.path.join(args.state, "raw")
    listing = listing_provider(args.docs, 0, spark).localCheckpoint(eager=True)

    samples: dict[str, list[float]] = {"diff": [], "guard": []}
    for _ in range(args.reps + 1):  # first pass = warm-up, dropped below
        parts = _read_state_parts(spark, raw)
        t0 = time.perf_counter()
        INC.sync_diff_parts(listing, parts).write.format("noop").mode(
            "overwrite"
        ).save()
        samples["diff"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        cand, allowed, ratio = INC.guarded_deletes_parts(parts, listing)
        samples["guard"].append(time.perf_counter() - t0)
    for leg in samples:
        samples[leg] = samples[leg][1:]
    parts = _read_state_parts(spark, raw)
    plan = (
        INC.sync_diff_parts(listing, parts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    print(
        json.dumps(
            {
                "metric": "sync_diff_probe",
                "docs": args.docs,
                "split_path": parts[1] is not None,
                "state_scan_bucketed": "Bucketed: true" in plan,
                "diff_med": round(statistics.median(samples["diff"]), 2),
                "diff_best": round(min(samples["diff"]), 2),
                "guard_med": round(statistics.median(samples["guard"]), 2),
                "guard_best": round(min(samples["guard"]), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
