#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/r13/.

Usage: python scripts/capture_plans.py <tag> [query ...]
  tag: 'before' or 'after' (file suffix)
  queries: names from eea_crawler_spark.plans.QUERIES; default = all.

Note: some extras (ann_ivf_state, dedup_cluster_incr, ...) execute
bounded driver actions while BUILDING their plan (eager checkpoints,
index builds), so capturing their explain costs a few jobs; the final
returned plan is what the driver's noop sink executes and is what gets
captured here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eea_crawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans", data_dir=sf_dir)

    from eea_crawler_spark.plans import QUERIES
    from eea_crawler_spark.sources.tables import cache_tables

    cache_tables(spark, sf_dir, ("documents", "embeddings"))
    if not names:
        names = list(QUERIES)
    for name in names:
        try:
            import contextlib
            import io

            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # capture the failure, don't stop the sweep
            plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
