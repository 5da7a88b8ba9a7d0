#!/usr/bin/env python
"""q7 on a bucketed lakehouse layout vs plain parquet, same data.

BASELINE.md's sf100 measurement shows q7's cost on plain parquet is
dominated by shuffling the lineitem fact table (600M rows) into its
orders join. This script measures the production answer: lineitem and
orders bucketed on their order key (``sinks.indexes.save_bucketed``)
join with zero fact-side Exchange — the layout a standing 100 TB
corpus would use, amortizing the one-time bucketed write across every
subsequent sync/query.

Usage: python scripts/bench_q7_bucketed.py [--sf-dir .scale/sf10]
       [--buckets 32] [--reps 3]

Output: one JSON line {"metric": "q7_bucketed", "plain": {...},
"bucketed": {...}, "write_sec": N, ...}.
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
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf10"))
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")  # stall-free measurement profile
    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.sinks.indexes import read_bucketed, save_bucketed
    from eea_crawler_spark.sources.tables import load_table
    from eea_crawler_spark.plans.queries import q7, q7_plan

    spark = get_spark("q7-bucketed", data_dir=args.sf_dir)
    # the region-filtered customer projection measures ~36 MB at sf100
    # — just past AQE's 10 MB runtime-broadcast default, which would
    # shuffle 150M orders rows on custkey AND destroy orders' bucket
    # alignment. 64 MB is still runtime-stat-gated (a side that
    # measures bigger keeps the shuffle join), so the conversion stays
    # scale-safe.
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")

    bdir = os.path.join(args.sf_dir, "_bucketed")
    t0 = time.perf_counter()
    # one-time layout cost, reported honestly alongside the query wins
    save_bucketed(
        load_table(spark, args.sf_dir, "lineitem"),
        "bq7_lineitem",
        os.path.join(bdir, "lineitem"),
        key="l_orderkey",
        n_buckets=args.buckets,
    )
    save_bucketed(
        load_table(spark, args.sf_dir, "orders"),
        "bq7_orders",
        os.path.join(bdir, "orders"),
        key="o_orderkey",
        n_buckets=args.buckets,
    )
    write_sec = round(time.perf_counter() - t0, 3)
    print(f"bucketed write: {write_sec}s", file=sys.stderr)

    plain_df = q7(spark, args.sf_dir)
    bucketed_df = q7_plan(
        spark,
        read_bucketed(spark, "bq7_lineitem"),
        read_bucketed(spark, "bq7_orders"),
        load_table(spark, args.sf_dir, "customer"),
        load_table(spark, args.sf_dir, "nation"),
        load_table(spark, args.sf_dir, "region"),
    )
    assert [tuple(r) for r in bucketed_df.collect()] == [
        tuple(r) for r in plain_df.collect()
    ], "bucketed plan must produce the identical q7 answer"

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # interleaved passes (see bench_scale.py: burst-robust on this host)
    samples = {"plain": [], "bucketed": []}
    for df in (plain_df, bucketed_df):
        run(df)  # warm-up
    for _ in range(args.reps):
        for name, df in (("plain", plain_df), ("bucketed", bucketed_df)):
            t0 = time.perf_counter()
            run(df)
            samples[name].append(time.perf_counter() - t0)
    stats = {
        n: {"med": round(statistics.median(s), 3), "best": round(min(s), 3)}
        for n, s in samples.items()
    }
    for n, st in stats.items():
        print(f"q7 {n}: med={st['med']} best={st['best']}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "q7_bucketed",
                "sf_dir": args.sf_dir,
                "buckets": args.buckets,
                "write_sec": write_sec,
                "plain": stats["plain"],
                "bucketed": stats["bucketed"],
                "speedup_med": round(
                    stats["plain"]["med"] / stats["bucketed"]["med"], 2
                ),
            }
        )
    )
    spark.sql("DROP TABLE IF EXISTS bq7_lineitem")
    spark.sql("DROP TABLE IF EXISTS bq7_orders")
    spark.stop()


if __name__ == "__main__":
    main()
