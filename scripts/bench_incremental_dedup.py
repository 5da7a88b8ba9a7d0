#!/usr/bin/env python
"""Incremental (delta-vs-corpus) dedup wall: 5M-doc state x 50k delta.

Round-8 VERDICT #1's done-criterion. Corpus = `.scale/sf100/documents`
(5M docs, the same table whose FULL n-gram self-join measured ~42 s in
round 7/8); delta = every `--delta-mod`-th doc (1% at the default 100).
Legs, each timed separately:

  build   one-time corpus state build (`build_text_dedup_state`):
          per-doc shingle arrays + MinHash signatures persisted — the
          amortized cost a standing corpus pays ONCE, not per run.
  ngram   `ngram_jaccard_pairs(new, against=corpus,
          against_arrays=state)` — the nightly probe.
  minhash `minhash_lsh_pairs(new, against=corpus, against_arrays=...,
          against_sigs=...)`.
  full    the corpus self-join reference wall (skippable) — what the
          nightly run USED to cost without the incremental shape.

Usage: python scripts/bench_incremental_dedup.py
         [--sf-dir .scale/sf100] [--delta-mod 100] [--skip-full]
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
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf100"))
    ap.add_argument("--delta-mod", type=int, default=100)
    ap.add_argument(
        "--state", default=os.path.join(REPO, ".scale", "dedup_state")
    )
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument(
        "--legs", default="text,emb",
        help="comma list of: text (state build + ngram + minhash), emb",
    )
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--max-df", type=int, default=20)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import dedup as DD
    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.sources.tables import load_table

    spark = get_spark("inc-dedup", data_dir=args.sf_dir)
    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text"
    )
    new = docs.filter(F.col("doc_id") % args.delta_mod == 0)
    corpus = docs.filter(F.col("doc_id") % args.delta_mod != 0)
    n_new, n_corpus = new.count(), corpus.count()
    print(f"delta {n_new} corpus {n_corpus}", file=sys.stderr)

    out: dict = {
        "metric": "incremental_dedup",
        "docs": n_new + n_corpus,
        "delta": n_new,
    }
    legs = set(args.legs.split(","))

    if "text" in legs:
        if os.path.exists(args.state):
            shutil.rmtree(args.state)
        t0 = time.perf_counter()
        DD.build_text_dedup_state(
            corpus, args.state,
            threshold=args.threshold, max_df=args.max_df,
        )
        out["state_build_sec"] = round(time.perf_counter() - t0, 2)
        print(f"state build: {out['state_build_sec']}s", file=sys.stderr)

        arrays, sigs = DD.read_text_dedup_state(spark, args.state)
        state = DD.read_text_dedup_state_full(spark, args.state)

        # serving probe: persisted prefix/df/hp0 — the corpus text is
        # never read; one columnar corpus-prefix scan (candidate join)
        t0 = time.perf_counter()
        n_pairs_s = DD.ngram_jaccard_pairs(
            new, threshold=args.threshold, max_df=args.max_df,
            against_state=state,
        ).count()
        out["ngram_delta_serving_sec"] = round(time.perf_counter() - t0, 2)
        out["ngram_delta_serving_pairs"] = n_pairs_s
        print(
            f"ngram delta (serving state): "
            f"{out['ngram_delta_serving_sec']}s ({n_pairs_s} pairs)",
            file=sys.stderr,
        )

        t0 = time.perf_counter()
        n_pairs = DD.ngram_jaccard_pairs(
            new, threshold=args.threshold, max_df=args.max_df,
            against=corpus, against_arrays=arrays,
        ).count()
        out["ngram_delta_sec"] = round(time.perf_counter() - t0, 2)
        out["ngram_delta_pairs"] = n_pairs
        print(
            f"ngram delta: {out['ngram_delta_sec']}s ({n_pairs} pairs)",
            file=sys.stderr,
        )
        if n_pairs_s != n_pairs:
            print(
                f"WARNING: serving/stateless pair-count mismatch "
                f"{n_pairs_s} != {n_pairs}",
                file=sys.stderr,
            )

        t0 = time.perf_counter()
        n_mh_s = DD.minhash_lsh_pairs(
            new, threshold=args.threshold, against_state=state
        ).count()
        out["minhash_delta_serving_sec"] = round(time.perf_counter() - t0, 2)
        out["minhash_delta_serving_pairs"] = n_mh_s
        print(
            f"minhash delta (serving state): "
            f"{out['minhash_delta_serving_sec']}s ({n_mh_s} pairs)",
            file=sys.stderr,
        )

        t0 = time.perf_counter()
        n_mh = DD.minhash_lsh_pairs(
            new, threshold=args.threshold, against=corpus,
            against_arrays=arrays, against_sigs=sigs,
        ).count()
        out["minhash_delta_sec"] = round(time.perf_counter() - t0, 2)
        out["minhash_delta_pairs"] = n_mh
        print(
            f"minhash delta: {out['minhash_delta_sec']}s ({n_mh} pairs)",
            file=sys.stderr,
        )
        if n_mh_s != n_mh:
            print(
                f"WARNING: minhash serving/stateless mismatch "
                f"{n_mh_s} != {n_mh}",
                file=sys.stderr,
            )

    if "emb" in legs:
        # embedding delta-vs-state: the third operator family. Delta
        # small enough for the broadcast-cross fast path (one narrow
        # state pass).
        emb = load_table(spark, args.sf_dir, "embeddings")
        e_new = emb.filter(F.col("vec_id") % args.delta_mod == 0)
        e_state = emb.filter(F.col("vec_id") % args.delta_mod != 0)
        from eea_crawler_spark.operators import similarity as SIM

        t0 = time.perf_counter()
        n_emb = SIM.neardup_pairs(
            e_new, threshold=0.9, against=e_state
        ).count()
        out["emb_delta_sec"] = round(time.perf_counter() - t0, 2)
        out["emb_delta_pairs"] = n_emb
        print(
            f"emb delta: {out['emb_delta_sec']}s ({n_emb} pairs)",
            file=sys.stderr,
        )

    if not args.skip_full:
        t0 = time.perf_counter()
        n_full = DD.ngram_jaccard_pairs(
            docs, threshold=args.threshold, max_df=args.max_df
        ).count()
        out["ngram_full_sec"] = round(time.perf_counter() - t0, 2)
        out["ngram_full_pairs"] = n_full
        print(
            f"ngram full self-join: {out['ngram_full_sec']}s "
            f"({n_full} pairs)",
            file=sys.stderr,
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
