#!/usr/bin/env python
"""The persisted IVF ANN index at representative scale (round-10
verdict #2): build on the standing corpus, O(delta) append, serve —
the vector-search serving surface a 100-TB operator maintains nightly
(mirror of dags/lib/elastic.py:107-119).

Corpus = a vectors parquet (default `.scale/neardup768`, 1M×768) split
on --delta-mod: every N-th vector plays the nightly batch. Legs:

  build   `build_ivf_index` (Lloyd centroids + cluster-partitioned
          lists + running aggregates). The O(corpus) cost paid once.
  append  `append_ivf_index` with the delta — assignment against the
          standing centroids, partitioned append, agg fold, drift
          triggers. The nightly number.
  serve   `ivf_topk_state` for --queries query vectors at --n-probe
          (partition-pruned) AND at probe-all; recall of the partial
          probe vs the probe-all exact answer rides the output.

Usage: python scripts/bench_ivf_index.py
         [--src .scale/neardup768] [--delta-mod 20]
         [--n-clusters 64] [--queries 100] [--n-probe 8]
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
                    help="int or 'auto' (k ~= sqrt(n) clamped)")
    ap.add_argument("--n-iter", type=int, default=2)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--n-probe", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--work", default=os.path.join(REPO, ".scale", "ivf_index"))
    ap.add_argument("--keep-work", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import similarity as SIM
    from eea_crawler_spark.session import get_spark

    if os.path.exists(args.work):
        shutil.rmtree(args.work)
    n_clusters = (
        "auto" if args.n_clusters == "auto" else int(args.n_clusters)
    )
    spark = get_spark("ivf-bench", data_dir=None)
    vecs = spark.read.parquet(args.src)
    delta = vecs.filter(F.col("vec_id") % args.delta_mod == 0)
    corpus = vecs.filter(F.col("vec_id") % args.delta_mod != 0)
    n_corpus, n_delta = corpus.count(), delta.count()
    print(f"corpus {n_corpus} delta {n_delta}", file=sys.stderr)
    out: dict = {
        "src": args.src,
        "corpus": n_corpus,
        "delta": n_delta,
        "n_clusters": args.n_clusters,
        "n_probe": args.n_probe,
        "k": args.k,
        "queries": args.queries,
    }

    t0 = time.perf_counter()
    meta = SIM.build_ivf_index(
        corpus, args.work, n_clusters=n_clusters, n_iter=args.n_iter
    )
    out["resolved_n_clusters"] = meta["n_clusters"]
    out["build_sec"] = round(time.perf_counter() - t0, 1)
    print(f"build {out['build_sec']}s {meta}", file=sys.stderr)

    t0 = time.perf_counter()
    app = SIM.append_ivf_index(spark, args.work, delta)
    out["append_sec"] = round(time.perf_counter() - t0, 1)
    out["append"] = {
        k: (round(v, 4) if isinstance(v, float) else v)
        for k, v in app.items()
    }
    print(f"append {out['append_sec']}s {out['append']}", file=sys.stderr)

    # deterministic query sample: the first --queries appended vectors
    # (they exercise the appended rows' servability too)
    queries = delta.orderBy("vec_id").limit(args.queries).localCheckpoint(
        eager=True
    )

    t0 = time.perf_counter()
    part = SIM.ivf_topk_state(
        spark, args.work, queries, k=args.k, n_probe=args.n_probe
    ).collect()
    out["serve_sec"] = round(time.perf_counter() - t0, 1)
    print(f"serve(n_probe={args.n_probe}) {out['serve_sec']}s "
          f"{len(part)} rows", file=sys.stderr)

    t0 = time.perf_counter()
    full = SIM.ivf_topk_state(
        spark, args.work, queries, k=args.k,
        n_probe=meta["n_clusters"]
    ).collect()
    out["serve_all_sec"] = round(time.perf_counter() - t0, 1)
    got = {(r["q_id"], r["vec_id"]) for r in part}
    want = {(r["q_id"], r["vec_id"]) for r in full}
    out["recall_at_probe"] = round(len(got & want) / max(1, len(want)), 4)
    print(
        f"serve(probe-all) {out['serve_all_sec']}s "
        f"recall@{args.n_probe}/{meta['n_clusters']}={out['recall_at_probe']}",
        file=sys.stderr,
    )

    print(json.dumps(out))
    if not args.keep_work and os.path.exists(args.work):
        shutil.rmtree(args.work)
    spark.stop()


if __name__ == "__main__":
    main()
