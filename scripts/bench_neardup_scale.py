#!/usr/bin/env python
"""Non-degenerate near-dup scale fixture + measured walls (round-8
VERDICT #4, plus #2's 768-d hot-bucket record).

The replicated `.scale` embeddings are DEGENERATE for the near-dup
class (verbatim replicas). This script generates the honest fixture —
a planted 1M x 768-d float32 corpus with the three populations a crawl
corpus actually has:

  * a BOILERPLATE group (near-identical template embeddings, the skew
    that shares every LSH band bucket — C(n,2) true pairs),
  * planted near-dup CLUSTERS (size-4, cos ~= 0.999 — ground truth for
    recall),
  * isotropic noise (the bulk).

Measured legs:
  lsh        neardup_pairs_lsh at the threshold-derived banding over
             the full corpus: wall, planted-cluster recall (exact,
             computed Spark-side), boilerplate pair coverage.
  lsh_salt   same with max_bucket_rows forced BELOW the boilerplate
             bucket size — the salt-split fan-out path (round-8
             VERDICT #1 fix) on real 768-d data.
  exact_sub  the exact blocked operator on a 10% subsample (the full
             1M exact run is ~n^2*dim = 1.5e15 flops — recorded as a
             projection, not run); lsh on the same subsample for the
             in-window ratio + subset check.

Usage: python scripts/bench_neardup_scale.py [--rows 1000000]
         [--dim 768] [--out .scale/neardup768]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BOILER = 2000
CLUSTERS = 3000
CSIZE = 4
THRESHOLD = 0.9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "neardup768"))
    ap.add_argument("--exact-mod", type=int, default=10)
    ap.add_argument(
        "--legs", default="lsh,salt,exact",
        help="comma list of: lsh, salt, exact, delta",
    )
    ap.add_argument(
        "--delta-mod", type=int, default=20,
        help="delta leg: every Nth vector plays the nightly batch "
        "(default 20 -> 5%% of the corpus)",
    )
    ap.add_argument("--reuse-states", action="store_true")
    ap.add_argument(
        "--skip-auto", default="",
        help="comma list of auto labels to skip (5k,50k)",
    )
    ap.add_argument(
        "--bands", type=int, default=0,
        help="override n_bands (0 = threshold-derived); fewer bands "
        "trade boundary recall for an n_bands-proportional shuffle — "
        "this box's free disk caps the 1M x 768 run at ~8 bands",
    )
    args = ap.parse_args()
    legs = set(args.legs.split(","))

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "20g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")

    import numpy as np
    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import similarity as SIM
    from eea_crawler_spark.session import get_spark

    spark = get_spark("neardup-scale", data_dir=None)
    dim, rows = args.dim, args.rows
    planted_end = BOILER + CLUSTERS * CSIZE

    if not os.path.exists(args.out):
        t0 = time.perf_counter()

        def _gen(batches):
            import pandas as pd

            boiler_base = np.random.RandomState(999).standard_normal(dim)
            bases: dict[int, np.ndarray] = {}
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                vecs = []
                for i in ids:
                    rng = np.random.RandomState(int(5_000_000 + i) % (2**31))
                    if i < BOILER:
                        v = boiler_base + 0.001 * rng.standard_normal(dim)
                    elif i < planted_end:
                        cid = int((i - BOILER) // CSIZE)
                        if cid not in bases:
                            bases[cid] = np.random.RandomState(
                                1_000_000 + cid
                            ).standard_normal(dim)
                        v = bases[cid] + 0.02 * rng.standard_normal(dim)
                    else:
                        v = rng.standard_normal(dim)
                    vecs.append(v.astype(np.float32))
                yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

        (
            spark.range(rows)
            .repartition(64)
            .mapInPandas(_gen, "vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(args.out)
        )
        print(
            f"generated {rows}x{dim} in {time.perf_counter()-t0:.1f}s",
            file=sys.stderr,
        )

    # spread the corpus over many map tasks BEFORE the b× band fan-out:
    # with 64 fat input splits each map task emits ~280 MB into the
    # banded exchange and the ShuffleExternalSorter's spill+merge
    # transients peaked at ~2.5× the final shuffle bytes — over this
    # box's free disk; 256 slim tasks keep the transient at ~1.1×
    emb = spark.read.parquet(args.out).repartition(256)
    n_bands, band_planes = SIM._lsh_params_for(THRESHOLD)
    if args.bands:
        n_bands = args.bands
    out: dict = {
        "metric": "neardup_scale",
        "rows": rows,
        "dim": dim,
        "n_bands": n_bands,
        "band_planes": band_planes,
        "boiler": BOILER,
        "planted_clusters": CLUSTERS,
    }

    # planted ground truth: all within-cluster pairs (cos ~= 0.999)
    cl = spark.range(BOILER, planted_end).select(
        F.col("id").alias("a_id"),
        ((F.col("id") - BOILER) / CSIZE).cast("long").alias("cid"),
    )
    planted = (
        cl.alias("x")
        .join(cl.alias("y"), (F.col("x.cid") == F.col("y.cid")) & (F.col("x.a_id") < F.col("y.a_id")))
        .select(F.col("x.a_id").alias("a_id"), F.col("y.a_id").alias("b_id"))
    )

    def _run(tag, **kw):
        t0 = time.perf_counter()
        res = SIM.neardup_pairs_lsh(
            emb, threshold=THRESHOLD, n_bands=n_bands,
            band_planes=band_planes, **kw,
        ).localCheckpoint(eager=True)
        n = res.count()
        wall = round(time.perf_counter() - t0, 2)
        hits = res.join(planted, ["a_id", "b_id"], "left_semi").count()
        boiler_pairs = res.filter(
            (F.col("a_id") < BOILER) & (F.col("b_id") < BOILER)
        ).count()
        out[f"{tag}_sec"] = wall
        out[f"{tag}_pairs"] = n
        out[f"{tag}_recall"] = round(hits / (CLUSTERS * CSIZE * (CSIZE - 1) / 2), 4)
        out[f"{tag}_boiler_pairs"] = boiler_pairs
        print(
            f"{tag}: {wall}s pairs={n} recall={out[f'{tag}_recall']} "
            f"boiler={boiler_pairs}/{BOILER*(BOILER-1)//2}",
            file=sys.stderr,
        )

    if "lsh" in legs:
        _run("lsh")
    if "salt" in legs:
        # NOTE: at 1M rows and 8 planes every bucket holds ~3900 rows,
        # so even the DEFAULT 768-d cap (2730) salt-splits every bucket
        # (ns=2) — the lsh leg above IS the split-engaged record. This
        # leg forces a much smaller cap; each halving of the cap
        # DOUBLES the fan-out shuffle (rows ship ns× ≈ bucket/cap), so
        # 512 needs ~4× the lsh leg's scratch — more than this box has.
        _run("lsh_salt", max_bucket_rows=1024)

    if "delta" in legs:
        # the nightly-ingest shape: delta probes the persisted
        # partitioned signed relation (build paid once); compare with
        # the full-corpus lsh leg above / the recorded 491 s
        new = emb.filter(F.col("vec_id") % args.delta_mod == 7)
        corp = emb.filter(F.col("vec_id") % args.delta_mod != 7)
        n_new = new.count()
        state_path = args.out + "_state"
        t0 = time.perf_counter()
        SIM.build_embedding_state(
            corp, state_path, n_bands=n_bands, band_planes=band_planes
        )
        out["delta_state_build_sec"] = round(time.perf_counter() - t0, 2)
        print(
            f"embedding state build ({rows - n_new} rows): "
            f"{out['delta_state_build_sec']}s",
            file=sys.stderr,
        )
        st = SIM.read_embedding_state(spark, state_path)
        t0 = time.perf_counter()
        res = SIM.neardup_pairs_lsh(
            new, threshold=THRESHOLD, n_bands=n_bands,
            band_planes=band_planes, against_state=st,
        ).localCheckpoint(eager=True)
        n_pairs = res.count()
        out["delta_probe_sec"] = round(time.perf_counter() - t0, 2)
        out["delta_rows"] = n_new
        out["delta_pairs"] = n_pairs
        p_touch = planted.filter(
            (F.col("a_id") % args.delta_mod == 7)
            | (F.col("b_id") % args.delta_mod == 7)
        ).localCheckpoint(eager=True)
        n_truth = p_touch.count()
        hits = res.join(p_touch, ["a_id", "b_id"], "left_semi").count()
        out["delta_planted_recall"] = round(hits / max(1, n_truth), 4)
        print(
            f"delta probe ({n_new} rows): {out['delta_probe_sec']}s "
            f"pairs={n_pairs} planted-touching recall "
            f"{hits}/{n_truth}",
            file=sys.stderr,
        )

    if "auto" in legs:
        # round-9 verdict #3 done-criterion: auto-sized states (planes
        # from the declared delta, bands from the banding calculus) at
        # 5k and 50k deltas — the default state must be probe-usable,
        # with the id-only band relation keeping the build writable
        import shutil

        for dm, label in ((200, "5k"), (20, "50k")):
            if args.skip_auto and label in args.skip_auto.split(","):
                continue
            new = emb.filter(F.col("vec_id") % dm == 7)
            corp = emb.filter(F.col("vec_id") % dm != 7)
            n_new = new.count()
            sp = f"{args.out}_state_auto{label}"
            if os.path.exists(sp) and not args.reuse_states:
                shutil.rmtree(sp)
            t0 = time.perf_counter()
            if not os.path.exists(sp):
                SIM.build_embedding_state(
                    corp, sp, expected_delta_rows=n_new,
                    threshold=THRESHOLD,
                )
            out[f"auto{label}_build_sec"] = round(time.perf_counter() - t0, 2)
            st = SIM.read_embedding_state(spark, sp)
            out[f"auto{label}_n_bands"] = st["spec"]["n_bands"]
            out[f"auto{label}_band_planes"] = st["spec"]["band_planes"]
            t0 = time.perf_counter()
            res = SIM.neardup_pairs_lsh(
                new, threshold=THRESHOLD, against_state=st
            ).localCheckpoint(eager=True)
            n_pairs = res.count()
            out[f"auto{label}_probe_sec"] = round(time.perf_counter() - t0, 2)
            out[f"auto{label}_rows"] = n_new
            out[f"auto{label}_pairs"] = n_pairs
            p_touch = planted.filter(
                (F.col("a_id") % dm == 7) | (F.col("b_id") % dm == 7)
            ).localCheckpoint(eager=True)
            n_truth = p_touch.count()
            hits = res.join(p_touch, ["a_id", "b_id"], "left_semi").count()
            out[f"auto{label}_planted_recall"] = round(
                hits / max(1, n_truth), 4
            )
            print(
                f"auto{label}: build {out[f'auto{label}_build_sec']}s "
                f"({out[f'auto{label}_n_bands']}x"
                f"{out[f'auto{label}_band_planes']}), probe "
                f"{out[f'auto{label}_probe_sec']}s pairs={n_pairs} "
                f"recall {hits}/{n_truth}",
                file=sys.stderr,
            )

    if "exact" not in legs:
        print(json.dumps(out))
        spark.stop()
        return

    # exact on a 10% subsample (+ lsh on the same subsample for ratio)
    sub = emb.filter(F.col("vec_id") % args.exact_mod == 0)
    n_sub = sub.count()
    t0 = time.perf_counter()
    n_exact = SIM.neardup_pairs(
        sub, threshold=THRESHOLD, escalate_bytes=None
    ).count()
    out["exact_sub_sec"] = round(time.perf_counter() - t0, 2)
    out["exact_sub_rows"] = n_sub
    out["exact_sub_pairs"] = n_exact
    print(
        f"exact subsample ({n_sub} rows): {out['exact_sub_sec']}s "
        f"pairs={n_exact}",
        file=sys.stderr,
    )
    t0 = time.perf_counter()
    n_lsh_sub = SIM.neardup_pairs_lsh(
        sub, threshold=THRESHOLD, n_bands=n_bands, band_planes=band_planes
    ).count()
    out["lsh_sub_sec"] = round(time.perf_counter() - t0, 2)
    out["lsh_sub_pairs"] = n_lsh_sub
    print(f"lsh subsample: {out['lsh_sub_sec']}s pairs={n_lsh_sub}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
