#!/usr/bin/env python
"""Scale benchmark: core queries at sf1 (~6M lineitem), Spark vs DuckDB.

BASELINE.md's contract defense is a growth-rate argument — Spark's
per-query time is overhead-bound (near-flat in SF) while DuckDB's grows
with data, so the curves cross somewhere around a few GB. This script
produces the measurement instead of the argument:

1. **Generate sf1** (once, deterministic): 10 key-offset replicas of
   the driver's sf0.1 tables under ``.scale/sf1`` — join relationships
   survive because every foreign key is shifted by the same per-replica
   offset as its referenced primary key; region/nation stay the shared
   25-row dims. Nothing outside the repo directory is touched and the
   driver's testdata is read-only input.
2. **Time the declared core queries (q1-q32)** on both engines over the
   SAME parquet files: per query, one untimed warm-up then
   ``REPS`` timed runs, median + best reported. Spark executes the full
   plan through the noop sink (no driver materialization); DuckDB runs
   the declared oracle SQL with fetchall (its result sets are the same
   small aggregates).

Output: one JSON line (machine) plus a markdown table (for BASELINE.md).

Usage: python scripts/bench_scale.py [--sf-dir DIR] [--replicas 10]
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

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# key column → (table that owns it); every occurrence of the key in any
# table is shifted by replica_idx * (max_key + 1) of the OWNING table,
# so foreign keys keep pointing at the same replica's rows
KEY_OWNERS = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
SHARED_DIMS = {"region", "nation"}  # stay 5/25 rows at every SF


def generate(spark, src_dir: str, dst_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    offsets = {}
    for owner, key in set(KEY_OWNERS.values()):
        df = spark.read.parquet(f"{src_dir}/{owner}.parquet")
        offsets[(owner, key)] = int(df.agg(F.max(key)).first()[0]) + 1
    for t in TABLES:
        dst = f"{dst_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        base = spark.read.parquet(f"{src_dir}/{t}.parquet")
        if t in SHARED_DIMS:
            base.write.mode("overwrite").parquet(dst)
            continue
        parts = []
        for i in range(replicas):
            rep = base
            for col in base.columns:
                if col in KEY_OWNERS:
                    step = offsets[KEY_OWNERS[col]]
                    rep = rep.withColumn(
                        col, (F.col(col) + F.lit(i * step)).cast(
                            dict(base.dtypes)[col]
                        )
                    )
            if t == "documents" and i > 0:
                # Replicating text VERBATIM makes the corpus degenerate
                # for the dedup/LSH operators: every doc gains R-1 exact
                # copies, so near-dup output grows quadratically in the
                # replica count and every shingle's document frequency
                # crosses any realistic hot-cap. Tag every 3rd word with
                # the replica index instead: every word-3-gram shingle
                # then contains ≥1 tagged word, so replicas share ZERO
                # shingles — the base corpus' near-dup structure repeats
                # once per replica (linear output growth), which is the
                # shape a real N×-larger crawl has. Replica 0 keeps the
                # source text, so chained generations (sf1→sf10→sf100)
                # nest tags hierarchically and stay pairwise distinct.
                rep = rep.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w, j: F.when(
                                j % 3 == F.lit(0), F.concat(w, F.lit(f"_r{i}"))
                            ).otherwise(w),
                        ),
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for rep in parts[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(dst)
        print(f"generated {t}: {out.count()} rows", file=sys.stderr)


def time_passes(fns: dict, reps: int = REPS) -> tuple[dict, dict]:
    """Time each query ``reps`` times in interleaved passes.

    This host has multi-second noisy-neighbor bursts (CPU steal); with
    back-to-back reps one burst poisons every sample of whichever query
    it lands on and the median reads as a 3-10x plan regression.
    Interleaving spaces a query's reps minutes apart so the per-query
    MIN is burst-robust; median still reported for honesty. Both
    engines get identical treatment.
    """
    samples: dict[str, list[float]] = {n: [] for n in fns}
    for n, fn in fns.items():
        fn()  # warm-up (codegen / buffer cache), untimed
    for _ in range(reps):
        for n, fn in fns.items():
            t0 = time.perf_counter()
            fn()
            samples[n].append(time.perf_counter() - t0)
    med = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    best = {n: round(min(s), 4) for n, s in samples.items()}
    return med, best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--queries", default="")  # comma list; default core
    # LLM-pipeline operators at scale. emb_neardup_pairs is DELIBERATELY
    # absent: it is the documented exact small-corpus tool (O(N²) pair
    # scoring); its scale twins are dedup_minhash_lsh / ann_lsh / ivf.
    ap.add_argument(
        "--extras",
        action="store_true",
        help="time the LLM-pipeline operators instead of core q1-q32",
    )
    ap.add_argument(
        "--engine", default="both", choices=["both", "spark", "duckdb"],
        help="run one engine only (to fit a sweep into bounded windows)",
    )
    args = ap.parse_args()
    EXTRAS = [
        "text_fingerprint", "text_tokens", "text_langid", "text_quality",
        "text_chunks", "dedup_exact", "dedup_ngram_jaccard",
        "dedup_minhash_lsh", "ann_cosine_topk", "mm_decode_stub",
        "normalize_docs", "chunk_embed",
    ]
    if args.extras and not args.queries:
        args.queries = ",".join(EXTRAS)

    # local-mode execution memory is shared by all 32 task threads in one
    # JVM; the old 8g default OOMed a 600M-row sort/hash build at sf100
    # (~18 GB input). 16g clears that with spill headroom while keeping
    # the session's AlwaysPreTouch startup cost bounded (the sandbox
    # faults fresh guest pages at ~100 MB/s — see session.py). A real
    # cluster sizes executors per-node instead.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_FIXED_HEAP", "1")  # stall-free measurement profile

    from eea_crawler_spark.session import get_spark

    spark = get_spark("eea_crawler_spark-scale", data_dir=args.sf_dir)
    generate(spark, args.src_dir, args.sf_dir, args.replicas)
    # re-init session configs now that the data exists (shuffle
    # partitions / AQE are sized from input bytes at session build)
    spark.stop()
    spark = get_spark("eea_crawler_spark-scale", data_dir=args.sf_dir)

    from eea_crawler_spark.plans import CORE_QUERIES, QUERIES
    import __spark_entry__ as entry

    names = (
        [q.strip() for q in args.queries.split(",") if q.strip()]
        or sorted(CORE_QUERIES, key=lambda n: int(n[1:]) if n[1:].isdigit() else 99)
    )
    osql = entry.oracle_sql()

    def _spark_fn(name):
        fn = QUERIES[name]
        return lambda: fn(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    spark_med, spark_best = ({}, {})
    if args.engine in ("both", "spark"):
        spark_med, spark_best = time_passes({n: _spark_fn(n) for n in names})
        for name in names:
            print(
                f"spark {name}: med={spark_med[name]} best={spark_best[name]}",
                file=sys.stderr,
            )
    spark.stop()
    if args.engine == "spark":
        import json as _json

        print(_json.dumps({
            "metric": "scale_sweep_spark_only",
            "sf_dir": args.sf_dir,
            "spark_total_med": round(sum(spark_med.values()), 2),
            "spark_total_best": round(sum(spark_best.values()), 2),
            "spark": spark_med,
        }))
        return

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        # Spark writes <table>.parquet as a directory of part files
        p = f"{args.sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    def _duck_fn(sql):
        return lambda: con.execute(sql).fetchall()

    duck_fns = {n: _duck_fn(osql[n]) for n in names if osql.get(n)}
    duck_med, duck_best = time_passes(duck_fns)
    for name in duck_med:
        print(
            f"duckdb {name}: med={duck_med[name]} best={duck_best[name]}",
            file=sys.stderr,
        )

    ratios = {
        n: round(spark_med[n] / duck_med[n], 2)
        for n in names
        if n in spark_med and n in duck_med and duck_med[n] > 0
    }
    ratios_best = {
        n: round(spark_best[n] / duck_best[n], 2)
        for n in names
        if n in duck_best and duck_best[n] > 0
    }
    spark_total = round(sum(spark_med.values()), 3)
    duck_total = round(sum(duck_med.values()), 3)
    spark_total_best = round(sum(spark_best.values()), 3)
    duck_total_best = round(sum(duck_best.values()), 3)
    within_2x = sum(1 for r in ratios.values() if r <= 2.0)
    print(json.dumps({
        "metric": "scale_bench",
        "sf_dir": args.sf_dir,
        "replicas": args.replicas,
        "spark_total_sec": spark_total,
        "duckdb_total_sec": duck_total,
        "total_ratio": round(spark_total / duck_total, 2) if duck_total else None,
        "spark_total_best_sec": spark_total_best,
        "duckdb_total_best_sec": duck_total_best,
        "total_ratio_best": round(spark_total_best / duck_total_best, 2)
        if duck_total_best
        else None,
        "within_2x": within_2x,
        "within_2x_best": sum(1 for r in ratios_best.values() if r <= 2.0),
        "n_queries": len(ratios),
        "spark": spark_med,
        "spark_best": spark_best,
        "duckdb": duck_med,
        "duckdb_best": duck_best,
        "ratio": ratios,
        "ratio_best": ratios_best,
    }))
    # markdown table for BASELINE.md
    print("\n| query | spark med (s) | duckdb med (s) | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for n in names:
        if n in ratios:
            print(
                f"| {n} | {spark_med[n]} | {duck_med[n]} | {ratios[n]} |",
                file=sys.stderr,
            )
    print(
        f"| **total** | **{spark_total}** | **{duck_total}** | "
        f"**{round(spark_total / duck_total, 2) if duck_total else '-'}** |",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
