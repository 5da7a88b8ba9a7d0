#!/usr/bin/env python
"""The composed nightly ANN cadence wall (round-11 verdict #3) — the
vector twin of bench_dedup_maintenance.py, through the SAME pipeline
entrypoints the sync leg calls (run_ann_maintenance / ann_search), so
every number is the composed leg's, not a bare operator's.

Corpus = a vectors parquet (default `.scale/neardup768`, 1M×768) split
on --delta-mod. Legs:

  bootstrap     run_ann_maintenance with no index yet → build_ivf_index
                over the standing corpus. The O(corpus) cost paid once.
  nightly       the fresh 50k batch appends in O(delta).
  zero_change   the SAME batch re-delivered (identical vectors): the
                vec_hash staleness check makes it a no-op night.
  repair_scattered  (round-11 verdict #1 wall) every --repair-mod-th
                standing vector re-delivered MODIFIED with
                repair_in_place=True: partition-local eviction +
                re-assignment. Scattered ids touch ~every list — the
                honest worst case, still cheaper than rebuild because
                no Lloyd pass runs.
  repair_clustered  the same count of modified ids drawn from ONE
                inverted list: the doc-edit shape (a doc's chunks
                cluster together) — the O(touched-partitions) case the
                repair exists for.
  rebuild_at_trigger  a tiny-threshold config with rebuild_on_trigger:
                the needs_rebuild → in-line build_ivf_index wall.

A probe-all serve sanity-checks the repaired index: repaired ids must
serve their NEW vector's hash (exactness is oracle-checked at gate SF
by the ann_ivf_repair query; here we measure).

Usage: python scripts/bench_ann_cadence.py
         [--src .scale/neardup768] [--delta-mod 20] [--n-clusters 64]
         [--repair-count 2000] [--skip-rebuild-leg]
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
    ap.add_argument("--delta-mod", type=int, default=20)
    ap.add_argument("--n-clusters", default="64",
                    help="int or 'auto' (round-11 verdict #2 bench row)")
    ap.add_argument("--n-iter", type=int, default=2)
    ap.add_argument("--repair-count", type=int, default=2000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--n-probe", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--work", default=os.path.join(REPO, ".scale", "ann_cadence"))
    ap.add_argument("--keep-work", action="store_true")
    ap.add_argument("--skip-rebuild-leg", action="store_true")
    args = ap.parse_args()
    n_clusters = (
        "auto" if args.n_clusters == "auto" else int(args.n_clusters)
    )

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import similarity as SIM
    from eea_crawler_spark.pipeline import (
        AnnConfig,
        ann_search,
        run_ann_maintenance,
    )
    from eea_crawler_spark.session import get_spark

    if os.path.exists(args.work):
        shutil.rmtree(args.work)
    spark = get_spark("ann-cadence", data_dir=None)
    vecs = spark.read.parquet(args.src)
    delta = vecs.filter(F.col("vec_id") % args.delta_mod == 0)
    corpus = vecs.filter(F.col("vec_id") % args.delta_mod != 0)
    n_corpus, n_delta = corpus.count(), delta.count()
    print(f"corpus {n_corpus} delta {n_delta}", file=sys.stderr)
    acfg = AnnConfig(
        index_path=os.path.join(args.work, "ivf"),
        id_col="vec_id",
        n_clusters=n_clusters,
        n_iter=args.n_iter,
        repair_in_place=True,
        status_path=os.path.join(args.work, "status"),
    )
    out: dict = {
        "src": args.src, "corpus": n_corpus, "delta": n_delta,
        "n_clusters": args.n_clusters, "repair_count": args.repair_count,
    }

    def leg(name: str, fn):
        t0 = time.perf_counter()
        r = fn()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 1)
        out[name] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in r.items()
        } if isinstance(r, dict) else r
        print(f"{name} {out[f'{name}_sec']}s {out[name]}", file=sys.stderr)
        return r

    leg("bootstrap", lambda: run_ann_maintenance(
        spark, acfg, None, corpus=corpus))
    resolved_k = SIM.read_ivf_index(
        spark, acfg.index_path)["spec"]["n_clusters"]
    out["resolved_n_clusters"] = int(resolved_k)
    leg("nightly", lambda: run_ann_maintenance(spark, acfg, delta))
    leg("zero_change", lambda: run_ann_maintenance(spark, acfg, delta))

    # repair legs: standing ids re-delivered with REVERSED vectors
    mod_scattered = (
        corpus.filter(
            F.col("vec_id") % (n_corpus // args.repair_count) == 1
        )
        .withColumn("embedding", F.reverse("embedding"))
        .localCheckpoint(eager=True)
    )
    out["repair_scattered_rows"] = mod_scattered.count()
    leg("repair_scattered", lambda: run_ann_maintenance(
        spark, acfg, mod_scattered))

    one_list_ids = [
        r["vec_id"]
        for r in spark.read.parquet(f"{acfg.index_path}/lists")
        .select("vec_id").limit(args.repair_count).collect()
    ]
    mod_clustered = (
        vecs.join(
            spark.createDataFrame(
                [(i,) for i in one_list_ids], "vec_id bigint"
            ),
            ["vec_id"], "left_semi",
        )
        .withColumn(
            "embedding",
            F.transform(
                "embedding", lambda x: (x * F.lit(0.5)).cast("float")
            ),
        )
        .localCheckpoint(eager=True)
    )
    out["repair_clustered_rows"] = mod_clustered.count()
    leg("repair_clustered", lambda: run_ann_maintenance(
        spark, acfg, mod_clustered))

    # serve + sanity: a repaired id's stored hash equals its new vector
    queries = delta.orderBy("vec_id").limit(args.queries).localCheckpoint(
        eager=True
    )
    t0 = time.perf_counter()
    rows = ann_search(
        spark, acfg, queries, k=args.k, n_probe=args.n_probe
    ).collect()
    out["serve_sec"] = round(time.perf_counter() - t0, 1)
    print(f"serve {out['serve_sec']}s {len(rows)} rows", file=sys.stderr)
    lists = spark.read.parquet(f"{acfg.index_path}/lists")
    bad = (
        lists.join(
            mod_scattered.select(
                "vec_id", F.xxhash64("embedding").alias("__want")
            )
            # ids the clustered leg re-modified afterwards hold ITS
            # vector now — exclude them from the scattered-leg check
            .join(
                mod_clustered.select("vec_id"), ["vec_id"], "left_anti"
            ),
            ["vec_id"],
        )
        .filter(F.col("vec_hash") != F.col("__want"))
        .count()
    )
    out["repair_hash_mismatches"] = int(bad)
    assert bad == 0, f"{bad} repaired ids still hold their OLD vector"

    if not args.skip_rebuild_leg:
        trig = AnnConfig(
            index_path=acfg.index_path, id_col="vec_id",
            n_clusters=n_clusters, n_iter=args.n_iter,
            rebuild_append_fraction=1e-9, rebuild_on_trigger=True,
            status_path=acfg.status_path,
        )
        tiny = (
            vecs.orderBy(F.col("vec_id").desc()).limit(100)
            .withColumn("vec_id", F.col("vec_id") + 10_000_000)
            .localCheckpoint(eager=True)
        )
        live = corpus.unionByName(delta).unionByName(tiny)
        leg("rebuild_at_trigger", lambda: run_ann_maintenance(
            spark, trig, tiny, corpus=live))

    print(json.dumps(out))
    if not args.keep_work and os.path.exists(args.work):
        shutil.rmtree(args.work)
    spark.stop()


if __name__ == "__main__":
    main()
