#!/usr/bin/env python
"""MOR read-path worst case: resolve with a HIGH override fraction.

The resolve (`sinks.lakehouse._mor_parts`) broadcasts the segment key
set only while the live segment bytes sit under
``MOR_SEG_BROADCAST_MAX_BYTES``; past the cap the probes run as plain
joins. VERDICT r7 #5 asked for the worst-case measurement: 30-50% of a
multi-million-doc corpus overridden by un-compacted segments with the
cap exceeded, confirming the un-hinted fallback plans acceptably (the
bucketed+sorted base must contribute no Exchange and no Sort — only
the key side and the override window shuffle, both O(affected)).

Builds its own bucketed MOR state (or reuses ``--state`` if present:
point it at the raw table a `bench_sync_scale.py` run left behind),
then times:

  - ``resolve_full``   — read_table().count() with the override
    fraction in segments, broadcast cap forced to 0 (plain joins);
  - ``resolve_hinted`` — same state, default cap (broadcast if it
    fits), for the contrast;
  - ``compacted``      — after compact_table, the plain bucketed scan.

Usage: python scripts/bench_mor_resolve.py [--docs 5000000]
       [--override-pct 40] [--state DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--override-pct", type=int, default=40)
    ap.add_argument(
        "--state", default=os.path.join(REPO, ".scale", "mor_resolve")
    )
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.sinks import lakehouse as LK

    spark = get_spark("mor-resolve", data_dir=None)

    def doc_batch(n, stamp, mod):
        return spark.range(n).select(
            F.concat(F.lit("https://s.example/doc/"), F.col("id")).alias("id"),
            F.lit(stamp).alias("v"),
            F.lit(mod).cast("timestamp").alias("indexed_at"),
        )

    if not os.path.exists(args.state):
        t0 = time.perf_counter()
        LK.merge_upsert(
            spark, args.state, doc_batch(args.docs, "base", "2024-01-01"),
            key="id", order_col="indexed_at", backend="mor",
            n_buckets=args.buckets, batch_rows=args.docs,
        )
        print(f"built base: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    LK.compact_table(spark, args.state)  # start from a clean epoch

    # one corpus-fraction segment, compaction pinned off so it STAYS a
    # segment (the worst case the fraction bound normally prevents)
    LK.MOR_COMPACT_FRACTION = 1e9
    n_over = args.docs * args.override_pct // 100
    t0 = time.perf_counter()
    LK.merge_upsert(
        spark, args.state, doc_batch(n_over, "override", "2024-02-01"),
        key="id", order_col="indexed_at", backend="mor",
    )
    t_seg = round(time.perf_counter() - t0, 2)
    assert LK._mor_segments(args.state), "override must live in a segment"

    def timed_resolve():
        t0 = time.perf_counter()
        df = LK.read_table(spark, args.state)
        n = df.count()
        assert n == args.docs, n
        return round(time.perf_counter() - t0, 2)

    saved = LK.MOR_SEG_BROADCAST_MAX_BYTES
    LK.MOR_SEG_BROADCAST_MAX_BYTES = 0  # force the un-hinted fallback
    t_plain = timed_resolve()
    # plan pin at scale: the base side must contribute no Exchange and
    # no Sort. Two acceptable shapes: Catalyst estimates the key side
    # under its own broadcast threshold (BHJ — no shuffle requirement
    # at all, bucketing rightly unused), or the SMJ fallback where the
    # bucketed+sorted base streams and only the key side shuffles.
    untouched, winners, _ = LK.read_table_parts(spark, args.state)
    plan = untouched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "Bucketed: true" in plan, plan
    assert plan.count("Sort [") <= 1, "no corpus Sort on the untouched side"
    LK.MOR_SEG_BROADCAST_MAX_BYTES = saved
    t_hinted = timed_resolve()

    t0 = time.perf_counter()
    LK.MOR_COMPACT_FRACTION = 0.10
    LK.compact_table(spark, args.state)
    t_compact = round(time.perf_counter() - t0, 2)
    t_scan = timed_resolve()

    print(
        json.dumps(
            {
                "metric": "mor_resolve_worstcase",
                "docs": args.docs,
                "override_pct": args.override_pct,
                "segment_merge_sec": t_seg,
                "resolve_plain_joins_sec": t_plain,
                "resolve_default_cap_sec": t_hinted,
                "compaction_sec": t_compact,
                "post_compact_scan_sec": t_scan,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
