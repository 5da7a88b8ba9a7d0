#!/usr/bin/env python
"""The embedding dedup serving state's update-in-place repair wall
(round 12): build the state once, then repair a nightly-sized set of
MODIFIED vectors in place — the number that replaces the O(corpus)
rebuild for state freshness.

Auto banding at a nightly-sized expected delta lands the band-only
signed layout (band_planes > 12), so the signed eviction exercises the
honest band-dir rewrite path (id-only rows); the WIDE vectors relation
evicts partition-locally via its vb id-hash dirs either way.

Usage: python scripts/bench_embedding_repair.py
         [--src .scale/neardup768] [--take 200000] [--mod 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, ".scale", "neardup768"))
    ap.add_argument("--take", type=int, default=200_000)
    ap.add_argument("--mod", type=int, default=2000)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--work", default=os.path.join(REPO, ".scale", "emb_repair"))
    ap.add_argument("--keep-work", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import similarity as SIM
    from eea_crawler_spark.session import get_spark

    if os.path.exists(args.work):
        shutil.rmtree(args.work)
    spark = get_spark("emb-repair-bench", data_dir=None)
    corpus = spark.read.parquet(args.src).filter(
        F.col("vec_id") < args.take
    )
    n = corpus.count()
    out: dict = {"src": args.src, "corpus": n, "mod": args.mod}

    t0 = time.perf_counter()
    SIM.build_embedding_state(
        corpus, args.work, expected_delta_rows=args.mod,
        threshold=args.threshold,
    )
    out["build_sec"] = round(time.perf_counter() - t0, 1)
    spec = SIM.read_embedding_state(spark, args.work)["spec"]
    out["spec"] = {k: spec[k] for k in ("n_bands", "band_planes", "n_vb")}
    print(f"build {out['build_sec']}s spec {out['spec']}", file=sys.stderr)

    mod = (
        corpus.filter(F.col("vec_id") % max(1, n // args.mod) == 1)
        .withColumn("embedding", F.reverse("embedding"))
        .localCheckpoint(eager=True)
    )
    out["mod_rows"] = mod.count()
    t0 = time.perf_counter()
    r = SIM.repair_embedding_state(spark, args.work, updates=mod)
    out["repair_sec"] = round(time.perf_counter() - t0, 1)
    out["repair"] = {k: int(v) for k, v in r.items()}
    print(f"repair {out['repair_sec']}s {out['repair']}", file=sys.stderr)

    # sanity: every repaired id's stored vector is the NEW one
    vecs = spark.read.parquet(f"{args.work}/vectors")
    bad = (
        vecs.join(
            mod.select("vec_id", F.xxhash64("embedding").alias("__want")),
            ["vec_id"],
        )
        .filter(F.xxhash64("embedding") != F.col("__want"))
        .count()
    )
    out["hash_mismatches"] = int(bad)
    assert bad == 0 and r["n"] == n

    # the floor: a repair with nothing to do
    t0 = time.perf_counter()
    SIM.repair_embedding_state(spark, args.work)
    out["noop_sec"] = round(time.perf_counter() - t0, 1)

    print(json.dumps(out))
    if not args.keep_work and os.path.exists(args.work):
        shutil.rmtree(args.work)
    spark.stop()


if __name__ == "__main__":
    main()
