#!/usr/bin/env python
"""Sync-path scale proof: O(changed) quick sync vs O(corpus) renormalize.

BASELINE.md's incremental contract ("a quick sync reads the listing,
joins ids, and stops — O(changed), not O(corpus)") is plan-pinned at
small SF (tests/test_pipeline_e2e.py, tests/test_plan_audit.py) but was
never *timed* on a large state table. This script builds a multi-million
row raw/searchui state through the production entry point itself, then
measures the three walls the claim is about:

  1. ``initial``  — cold full sync of N docs (fetch + chain + merges):
                    the O(corpus) bound, and the state build.
  2. ``quick``    — re-sync with 1% of listing stamps bumped: the
                    incremental path. Diff join over N, but fetch +
                    normalize touch exactly N/100 docs.
  3. ``renorm``   — ``run_renormalize`` over the same state: the
                    reference's d4 full rebuild (chain over all N).

The listing is supplied Spark-side through ``SyncConfig.listing_provider``
(the explicit-id-list seam — the reference's trigger-crawl-for-id entry)
so a 5M-row listing never routes through a driver-side page walk; the
per-doc fetch still runs the real distributed ``fetch_docs`` leg against
a picklable synthetic transport (64 hosts → 64 parallel polite tasks).

Checks asserted, not just reported:
  - quick sync counts: fetched == normalized == N/100 exactly;
  - rows-touched: searchui rows re-stamped after the quick sync == N/100
    (every other row's indexed_at is untouched);
  - renormalize counts: N - (errored docs) == N.

Caveat recorded with the numbers: in this sandbox the state merge runs
the parquet swap twin (O(corpus) rewrite per merge — delta-spark is not
installable, BASELINE.md), so the quick-sync wall INCLUDES a full-table
rewrite; on a Delta runtime the same merge is O(changed files) and the
quick/renorm separation widens further.

Usage: python scripts/bench_sync_scale.py [--docs 5000000] [--state DIR]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_MOD = "2024-01-01T00:00:00"
BUMP_MOD = "2024-02-01T00:00:00"


_WORDS = (
    "environment climate water marine soil air emission policy report "
    "indicator assessment measure directive habitat species energy "
    "transport waste resource quality monitoring coastal urban forest"
).split()


class SynthTransport:
    """Picklable 'site': per-doc JSON computed from the URL, no state.

    Bodies are ~1.4 KB (≈190 words) — the size class of a real listing
    doc — so the normalize chain does production-shaped per-doc work;
    with 100-byte stubs every phase is table-rewrite-bound and the
    O(changed) chain separation is invisible."""

    def __call__(self, url: str):
        i = int(url.rsplit("/", 1)[-1])
        words = [_WORDS[(i + j * 7) % len(_WORDS)] for j in range(190)]
        return 200, json.dumps(
            {
                "@id": url,
                "title": f"Doc {i}",
                "description": f"Synthetic document {i}. " + " ".join(words),
                "language": "en",
                "review_state": "published",
            }
        )


def listing_provider(n_docs: int, bump_pct: int, spark):
    """N-row listing as a relation: id spread over 64 hosts (64 polite
    fetch tasks), every 100th id's stamp bumped when bump_pct=1."""
    from pyspark.sql import functions as F

    mod = (
        F.when(F.col("id") % 100 == 0, F.lit(BUMP_MOD)).otherwise(
            F.lit(BASE_MOD)
        )
        if bump_pct
        else F.lit(BASE_MOD)
    )
    return spark.range(n_docs).select(
        F.concat(
            F.lit("https://s"),
            (F.col("id") % 64).cast("string"),
            F.lit(".example/doc/"),
            F.col("id").cast("string"),
        ).alias("id"),
        F.lit("Document").alias("doc_type"),
        mod.alias("modified"),
        F.lit(False).alias("seo_noindex"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--state", default=os.path.join(REPO, ".scale", "sync_state"))
    # "mor" = merge-on-read state layout (sinks.lakehouse): merges append
    # O(batch) segments instead of rewriting the corpus — the production
    # layout for a standing corpus without Delta. "auto" resolves to the
    # copy-on-write parquet swap here; run both for the BASELINE table.
    ap.add_argument("--state-backend", default="mor")
    # bucketed state layout (mor only): the listing×state diff/guard
    # joins run with zero state-side Exchange — the round-7 answer to
    # the diff join being the largest quick-sync component (7.9 s of
    # 26.7 s at 5M docs). 64 buckets ≈ 100 MB/bucket at 5M docs.
    ap.add_argument("--state-buckets", type=int, default=64)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.pipeline import (
        SyncConfig,
        SyncPaths,
        run_renormalize,
        run_sync,
    )

    if os.path.exists(args.state):
        shutil.rmtree(args.state)
    paths = SyncPaths(
        raw=os.path.join(args.state, "raw"),
        searchui=os.path.join(args.state, "searchui"),
        quarantine=os.path.join(args.state, "quarantine"),
        status=os.path.join(args.state, "status"),
    )
    spark = get_spark("sync-scale", data_dir=None)
    from eea_crawler_spark.sinks import lakehouse as LK

    transport = SynthTransport()

    def cfg(bump: int) -> SyncConfig:
        return SyncConfig(
            site_url="https://s0.example",
            site_id="synth",
            listing_source="provided",
            listing_provider=functools.partial(
                listing_provider, args.docs, bump
            ),
            state_backend=args.state_backend,
            state_buckets=(
                args.state_buckets if args.state_backend == "mor" else None
            ),
        )

    t0 = time.perf_counter()
    r1 = run_sync(spark, cfg(0), paths, transport)
    t_initial = round(time.perf_counter() - t0, 2)
    print(f"initial: {t_initial}s {r1}", file=sys.stderr)
    assert r1["fetched"] == args.docs and r1["normalized"] == args.docs

    from pyspark.sql import functions as F

    hi_water = (
        LK.read_table(spark, paths.searchui)
        .agg(F.max("indexed_at"))
        .first()[0]
    )

    expect = args.docs // 100
    t0 = time.perf_counter()
    r2 = run_sync(spark, cfg(1), paths, transport)
    t_quick = round(time.perf_counter() - t0, 2)
    print(f"quick: {t_quick}s {r2}", file=sys.stderr)
    assert r2["fetched"] == expect, (r2, expect)
    assert r2["normalized"] == expect, (r2, expect)

    touched = (
        LK.read_table(spark, paths.searchui)
        .filter(F.col("indexed_at") > hi_water)
        .count()
    )
    assert touched == expect, (touched, expect)
    total = LK.read_table(spark, paths.searchui).count()
    assert total == args.docs, total

    # zero-change sync: the same bumped listing again — state already
    # carries the bumped stamps, so the sweep must classify nothing as
    # due and the wall is pure listing + sweep + status overhead
    t0 = time.perf_counter()
    r2b = run_sync(spark, cfg(1), paths, transport)
    t_zero = round(time.perf_counter() - t0, 2)
    print(f"zero: {t_zero}s {r2b}", file=sys.stderr)
    assert r2b["fetched"] == 0 and r2b["normalized"] == 0, r2b

    t0 = time.perf_counter()
    # per-site renormalize (the reference's d4 unit) — same single-site
    # dispatch prune the sync path gets, so the comparison is the
    # incremental-vs-full normalize work, not dispatch fan-out
    r3 = run_renormalize(spark, paths, site_id="synth")
    t_renorm = round(time.perf_counter() - t0, 2)
    print(f"renorm: {t_renorm}s {r3}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "sync_scale",
                "state_backend": args.state_backend,
                "state_buckets": args.state_buckets,
                "docs": args.docs,
                "initial_sync_sec": t_initial,
                "quick_sync_sec": t_quick,
                "zero_change_sync_sec": t_zero,
                "renormalize_sec": t_renorm,
                "quick_touched_rows": touched,
                "quick_over_renorm": round(t_quick / t_renorm, 3),
                "counts": {"initial": r1, "quick": r2, "renorm": r3},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
