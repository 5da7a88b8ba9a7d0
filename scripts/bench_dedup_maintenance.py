#!/usr/bin/env python
"""The composed nightly dedup wall (round-9 verdict #8): 5M-doc corpus,
50k-doc nightly batch — bootstrap once, then the O(delta) maintenance
leg end-to-end (probe → cluster fold → canonical flags → state append).

Corpus = `.scale/sf100/documents` split on --delta-mod: every N-th doc
plays the nightly batch (strictly-new ids, the append contract), the
rest the standing corpus. Legs:

  bootstrap  one-time backfill (`bootstrap_dedup_maintenance`): text
             state build + full n-gram self-join + connected components
             + canonical flags for every doc. The O(corpus) cost a
             standing corpus pays ONCE.
  nightly    `run_dedup_maintenance` with the 50k batch — the number a
             100-TB operator asks for. SPARK_GRAFT_SYNC_TIMING=1 prints
             the per-step decomposition (probe / cluster_fold /
             canonical_flags / state_append).
  nightly2   a second, empty-delta night (idempotence + floor).

State tables ride the MOR backend (the scale posture: O(batch) merge
segments, no corpus rewrites).

Usage: python scripts/bench_dedup_maintenance.py
         [--sf-dir .scale/sf100] [--delta-mod 100] [--work .scale/maint]
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
    ap.add_argument("--work", default=os.path.join(REPO, ".scale", "maint"))
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--max-df", type=int, default=20)
    ap.add_argument("--keep-work", action="store_true")
    ap.add_argument(
        "--method", default="ngram",
        help="ngram (documents table) | embedding (--sf-dir is then a "
        "vectors parquet like .scale/neardup768; id col vec_id)",
    )
    ap.add_argument("--cos-threshold", type=float, default=0.9)
    ap.add_argument(
        "--exact", action="store_true",
        help="exact-label mode (repair_in_place + pairs_path; round 13:"
        " any method) - adds a modified-docs repair night measuring the"
        " state repair + affected-component recompute wall",
    )
    ap.add_argument(
        "--repair", action="store_true",
        help="repair_in_place WITHOUT exact labels (monotone fold +"
        " stale ledger) - same modified-docs repair night, isolating"
        " the state-repair wall from the label recompute",
    )
    ap.add_argument(
        "--rebuild-leg", action="store_true",
        help="after the nightly legs, run a modified-docs night sized "
        "past the stale trigger with rebuild_on_trigger: measures the "
        "rebuild-at-trigger wall (round-10 verdict #1c)",
    )
    args = ap.parse_args()

    emb_mode = args.method == "embedding"
    os.environ.setdefault(
        "SPARK_GRAFT_DRIVER_MEM", "40g" if emb_mode else "16g"
    )
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")
    os.environ.setdefault("SPARK_GRAFT_SYNC_TIMING", "1")

    from pyspark.sql import functions as F

    from eea_crawler_spark.pipeline import (
        DedupConfig,
        bootstrap_dedup_maintenance,
        run_dedup_maintenance,
    )
    from eea_crawler_spark.session import get_spark
    from eea_crawler_spark.sources.tables import load_table

    if os.path.exists(args.work):
        shutil.rmtree(args.work)
    if emb_mode:
        spark = get_spark("dedup-maint", data_dir=None)
        docs = spark.read.parquet(args.sf_dir).repartition(256)
        id_col = "vec_id"
    else:
        spark = get_spark("dedup-maint", data_dir=args.sf_dir)
        docs = load_table(spark, args.sf_dir, "documents").select(
            "doc_id", "text"
        )
        id_col = "doc_id"
    delta = docs.filter(F.col(id_col) % args.delta_mod == 0)
    corpus = docs.filter(F.col(id_col) % args.delta_mod != 0)
    n_delta, n_corpus = delta.count(), corpus.count()
    print(f"corpus {n_corpus} delta {n_delta}", file=sys.stderr)

    dcfg = DedupConfig(
        state_path=os.path.join(args.work, "state"),
        clusters_path=os.path.join(args.work, "clusters"),
        flags_path=os.path.join(args.work, "flags"),
        method=args.method,
        text_col="text",
        threshold=args.threshold,
        max_df=args.max_df,
        cos_threshold=args.cos_threshold,
        expected_delta_rows=n_delta if emb_mode else None,
        state_backend="mor",
        repair_in_place=bool(args.exact or args.repair),
        pairs_path=(
            os.path.join(args.work, "pairs") if args.exact else None
        ),
    )
    out: dict = {
        "sf_dir": args.sf_dir,
        "corpus": n_corpus,
        "delta": n_delta,
        "threshold": args.threshold,
        "max_df": args.max_df,
    }

    t0 = time.perf_counter()
    boot = bootstrap_dedup_maintenance(
        spark, dcfg, corpus, id_col=id_col
    )
    out["bootstrap_sec"] = round(time.perf_counter() - t0, 1)
    out["bootstrap"] = boot
    print(f"bootstrap {out['bootstrap_sec']}s {boot}", file=sys.stderr)

    t0 = time.perf_counter()
    night = run_dedup_maintenance(spark, dcfg, delta, id_col=id_col)
    out["nightly_sec"] = round(time.perf_counter() - t0, 1)
    out["nightly"] = night
    print(f"nightly {out['nightly_sec']}s {night}", file=sys.stderr)

    # second night with nothing new: the leg's fixed floor
    t0 = time.perf_counter()
    empty = delta.filter(F.lit(False))
    night2 = run_dedup_maintenance(spark, dcfg, empty, id_col=id_col)
    out["nightly_empty_sec"] = round(time.perf_counter() - t0, 1)
    out["nightly_empty"] = night2

    if args.exact or args.repair:
        # repair night: ~n_delta standing docs re-delivered MODIFIED
        # (reversed vectors / token-prefixed texts) - state repair (+
        # in exact mode pair eviction + affected-component recompute),
        # the wall that replaces the rebuild cadence entirely
        mod = corpus.filter(F.col(id_col) % args.delta_mod == 1)
        if emb_mode:
            mod = mod.withColumn("embedding", F.reverse("embedding"))
        else:
            mod = mod.withColumn(
                "text", F.concat(F.lit("edited-tok "), F.col("text"))
            )
        mod = mod.localCheckpoint(eager=True)
        out["repair_rows"] = mod.count()
        t0 = time.perf_counter()
        rep_night = run_dedup_maintenance(spark, dcfg, mod, id_col=id_col)
        out["nightly_repair_sec"] = round(time.perf_counter() - t0, 1)
        out["nightly_repair"] = rep_night
        print(
            f"nightly_repair {out['nightly_repair_sec']}s {rep_night}",
            file=sys.stderr,
        )

    if args.rebuild_leg:
        # night 3: a MODIFIED slice sized just past the stale trigger
        # (rebuild_stale_fraction of the standing corpus, default 5%).
        # The leg probes the modified docs, ledgers them, trips the
        # trigger and — rebuild_on_trigger — runs the in-line rebuild
        # (bootstrap over the post-edit corpus, ledger reset). The wall
        # is what a 100-TB operator pays the night compaction fires.
        from dataclasses import replace as _dc_replace

        n_mod = int(dcfg.rebuild_stale_fraction * (n_corpus + n_delta)) + 1
        mod_col = "text" if not emb_mode else "embedding"
        standing = corpus.unionByName(delta)
        if emb_mode:
            mod = standing.limit(n_mod).withColumn(
                mod_col,
                F.transform(
                    F.col(mod_col),
                    lambda x: (x * F.lit(1.001)).cast("float"),
                ),
            )
        else:
            mod = standing.limit(n_mod).withColumn(
                mod_col, F.concat(F.col(mod_col), F.lit(" edited-tok"))
            )
        mod = mod.localCheckpoint(eager=True)
        mod_ids = mod.select(id_col)
        post_corpus = standing.join(
            mod_ids, [id_col], "left_anti"
        ).unionByName(mod)
        dcfg_rb = _dc_replace(dcfg, rebuild_on_trigger=True)
        t0 = time.perf_counter()
        night3 = run_dedup_maintenance(
            spark, dcfg_rb, mod, id_col=id_col, corpus=post_corpus
        )
        out["rebuild_leg_sec"] = round(time.perf_counter() - t0, 1)
        out["rebuild_leg"] = night3
        out["rebuild_mod_rows"] = n_mod
        print(
            f"rebuild-at-trigger {out['rebuild_leg_sec']}s {night3}",
            file=sys.stderr,
        )

    print(json.dumps(out))
    if not args.keep_work and os.path.exists(args.work):
        shutil.rmtree(args.work)
    spark.stop()


if __name__ == "__main__":
    main()
