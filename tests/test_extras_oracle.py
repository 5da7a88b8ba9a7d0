"""Training-data operators vs the DuckDB oracle + rows-only sanity checks."""

from __future__ import annotations

import pytest

from eea_crawler_spark.plans.extras import (
    EXTRA_ORACLE,
    EXTRA_QUERIES,
    UNDECLARED_QUERIES,
)
from tests.oracle_utils import assert_match, duckdb_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLE))
def test_extra_matches_oracle(name, spark, sf_dir, con):
    df = EXTRA_QUERIES[name](spark, sf_dir)
    assert_match(name, df, con, EXTRA_ORACLE[name])


@pytest.mark.parametrize(
    "name",
    sorted((set(EXTRA_QUERIES) - set(EXTRA_ORACLE)) | set(UNDECLARED_QUERIES)),
)
def test_oracle_less_extras_run(name, spark, sf_dir):
    df = {**EXTRA_QUERIES, **UNDECLARED_QUERIES}[name](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert df.columns  # stable schema


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH candidates must recover every pair the exact join finds ≥0.8."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in EXTRA_QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in EXTRA_QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert exact == lsh, f"missed={exact - lsh} spurious={lsh - exact}"


def test_ann_lsh_subset_of_bruteforce_space(spark, sf_dir):
    """LSH top-k rows must be real corpus vectors with sane ranks."""
    rows = UNDECLARED_QUERIES["ann_lsh_topk"](spark, sf_dir).collect()
    assert all(1 <= r.rnk <= 5 for r in rows)
    assert all(r.q_id != r.vec_id for r in rows)


def test_ann_ivf_probe_all_equals_bruteforce(spark, sf_dir):
    """Probing every inverted list must reproduce the exact top-k."""
    from eea_crawler_spark.operators import similarity as SIM
    from eea_crawler_spark.plans.extras import ANN_K, ANN_QUERY_MAX_ID
    from eea_crawler_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < ANN_QUERY_MAX_ID)
    exact = SIM.brute_force_topk(emb, queries, k=ANN_K).collect()
    ivf = SIM.ivf_topk(
        emb, queries, k=ANN_K, n_clusters=8, n_probe=8
    ).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]


def test_ann_ivf_partial_probe_recall(spark, sf_dir):
    """4-of-16 probing must still recover most exact neighbors."""
    exact = {
        (r.q_id, r.vec_id)
        for r in EXTRA_QUERIES["ann_cosine_topk"](spark, sf_dir).collect()
    }
    ivf = {
        (r.q_id, r.vec_id)
        for r in UNDECLARED_QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.5, f"recall={recall:.2f}"


def test_ngram_jaccard_df_cap_preserves_high_pairs(spark, sf_dir):
    """The document-frequency cap must not lose any pair the uncapped
    exact join reports at the 0.8 threshold, and surviving pairs keep
    identical Jaccard values (full shingle sets used for scoring)."""
    from eea_crawler_spark.operators.dedup import ngram_jaccard_pairs
    from eea_crawler_spark.plans.extras import JACCARD_THRESHOLD
    from eea_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=JACCARD_THRESHOLD).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_df=5
        ).collect()
    }
    assert capped == exact  # near-dup pairs share rare shingles too


def test_ngram_shuffle_rescore_equals_broadcast(spark, sf_dir, monkeypatch):
    """The capped path picks its rescore plan by candidate shingle
    volume (broadcast below RESCORE_BROADCAST_MAX_BYTES, pair-anchored
    shuffle join above — the plan that survives a 5M-doc corpus where
    the broadcast build exceeded driver.maxResultSize). Both plans must
    emit identical pairs AND identical Jaccard values; forcing the gate
    to 0 exercises the shuffle leg on the same corpus the driver
    hash-checks."""
    from eea_crawler_spark.operators import dedup
    from eea_crawler_spark.plans.extras import JACCARD_THRESHOLD
    from eea_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    broadcast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_df=5
        ).collect()
    }
    monkeypatch.setattr(dedup, "RESCORE_BROADCAST_MAX_BYTES", 0)
    shuffled = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_df=5
        ).collect()
    }
    assert broadcast and shuffled == broadcast


def test_hashed_shingles_equal_hashed_string_shingles(spark, sf_dir):
    """shingles(hashed=True) must emit exactly xxhash64 of the string
    shingles — the hash moves inside the per-doc array for speed, not
    to change the set the MinHash/capped paths consume."""
    from pyspark.sql import functions as F

    from eea_crawler_spark.operators.dedup import shingles
    from eea_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    via_strings = sorted(
        (r["id"], r["h"])
        for r in shingles(docs, "text", "doc_id", 3)
        .select("id", F.xxhash64("shingle").alias("h"))
        .collect()
    )
    direct = sorted(
        (r["id"], r["shingle"])
        for r in shingles(docs, "text", "doc_id", 3, hashed=True).collect()
    )
    assert via_strings == direct and len(direct) > 0


def test_numpy_xxh64_matches_spark_expression(spark):
    """The vectorized permutation hash (dedup._xxh64_long_vec over a
    dedup._xxh64_seed_int seed) must equal Spark's XxHash64 expression
    xxhash64(lit(i), x) bit-for-bit — the property that makes the
    shuffle-free signature pass value-identical to the old aggregate."""
    import numpy as np
    from pyspark.sql import functions as F

    from eea_crawler_spark.operators.dedup import (
        _xxh64_long_vec,
        _xxh64_seed_int,
    )

    rng = np.random.RandomState(3)
    vals = rng.randint(-(2**63), 2**63 - 1, size=512, dtype=np.int64)
    edge = np.asarray([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64)
    vals = np.concatenate([vals, edge])
    df = spark.createDataFrame(
        [(int(j), int(v)) for j, v in enumerate(vals)], "j int, x bigint"
    )
    for i in (0, 1, 7, 63):
        exp = {
            r["j"]: r["h"]
            for r in df.select("j", F.xxhash64(F.lit(i), "x").alias("h")).collect()
        }
        got = _xxh64_long_vec(vals.view(np.uint64), _xxh64_seed_int(i)).view(
            np.int64
        )
        assert [int(g) for g in got] == [exp[j] for j in range(len(vals))]


def test_minhash_signatures_equal_exploded_aggregate(spark, sf_dir):
    """The mapInPandas signature pass must reproduce the exploded
    groupBy 64-min-column aggregate it replaced, row for row."""
    from pyspark.sql import functions as F

    from eea_crawler_spark.operators.dedup import minhash_signatures, shingles
    from eea_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300)
    num_hashes = 64
    sh = shingles(docs, "text", "doc_id", 3, hashed=True)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    old = sorted(
        (r["id"], list(r["sig"]))
        for r in sh.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))
        .collect()
    )
    new = sorted(
        (r["id"], list(r["sig"]))
        for r in minhash_signatures(docs).collect()
    )
    assert new == old and len(new) > 0


def test_ngram_cap_hot_boilerplate_cluster(spark):
    """Hot shared-boilerplate near-dups must survive the capped path.

    Regression pin for the positional-filter bound: a cluster of docs
    sharing a large boilerplate makes the boilerplate's prefix shingles
    hot (df > max_df), so they are anti-joined out of candidate
    generation. A near-dup pair inside the cluster is still found via
    its cold pair-specific prefix shingles, but the shared HOT prefix
    shingles hashing below the largest cold match are in neither ``cp``
    nor the ``na-ia``/``nb-jb`` tails — an upper bound that ignores
    them undercounts the true intersection and silently prunes pairs
    whose real Jaccard clears the threshold. The bound must carry a
    ``+ min(hp_a, hp_b)`` hot-prefix correction."""
    from eea_crawler_spark.operators.dedup import ngram_jaccard_pairs

    boiler = " ".join(f"boiler{i}" for i in range(60))
    rows = []
    for p in range(5):  # 5 near-dup pairs -> 10 docs sharing the boilerplate
        pair_text = " ".join(f"pair{p}w{i}" for i in range(30))
        for side in ("a", "b"):
            tail = " ".join(f"tail{p}{side}{i}" for i in range(3))
            rows.append((f"d{p}{side}", f"{boiler} {pair_text} {tail}"))
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.8, max_df=3).collect()
    }
    assert len(exact) == 5  # each pair is a near-dup; cross-pair J < 0.8
    assert capped == exact


def test_ngram_cap_random_corpora_recall(spark):
    """Randomized capped==uncapped pin: seeded corpora mixing shared
    boilerplate (hot shingles), clustered near-dups, and unique tails,
    across two thresholds and a tight df cap — the shapes that exercise
    every branch of the prefix/positional/hot-correction filter at
    recall 1.0."""
    import random

    from eea_crawler_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(11)
    for corpus_i in range(2):
        vocab = [f"w{corpus_i}x{i}" for i in range(80)]
        boiler = " ".join(rng.choices(vocab, k=rng.randint(20, 50)))
        rows = []
        for c in range(6):  # 6 clusters of 2-3 near-dup docs
            core = " ".join(
                f"c{corpus_i}k{c}w{i}" for i in range(rng.randint(15, 40))
            )
            for s in range(rng.randint(2, 3)):
                tail = " ".join(
                    f"t{corpus_i}{c}{s}{i}" for i in range(rng.randint(0, 4))
                )
                body = f"{boiler} {core} {tail}" if rng.random() < 0.8 else f"{core} {tail}"
                rows.append((f"d{corpus_i}_{c}_{s}", body.strip()))
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        for threshold in (0.7, 0.85):
            exact = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in ngram_jaccard_pairs(docs, threshold=threshold).collect()
            }
            capped = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in ngram_jaccard_pairs(
                    docs, threshold=threshold, max_df=3
                ).collect()
            }
            assert capped == exact, (corpus_i, threshold)


def test_ngram_sort_gate_orderby_equals_single_task(
    spark, sf_dir, monkeypatch
):
    """Round-14 (r13 verdict #5): past SINGLE_SORT_MAX_ROWS the
    trailing sort switches from the one-task sortWithinPartitions to a
    lazy-checkpoint + range-partitioned orderBy — rows AND order must
    be identical on the self-join, the delta probe, and the
    incremental-cluster merge."""
    from pyspark.sql import functions as F

    from eea_crawler_spark.operators import dedup
    from eea_crawler_spark.plans.extras import (
        JACCARD_THRESHOLD,
        dedup_cluster_incr,
    )
    from eea_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)

    def _rows(df):
        return [tuple(r) for r in df.collect()]

    single = _rows(
        dedup.ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_df=5
        )
    )
    single_delta = _rows(
        dedup.ngram_jaccard_pairs(
            new, threshold=JACCARD_THRESHOLD, max_df=5, against=corpus
        )
    )
    single_incr = _rows(dedup_cluster_incr(spark, sf_dir))
    single_mh = _rows(
        dedup.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)
    )
    single_mh_delta = _rows(
        dedup.minhash_lsh_pairs(
            new, threshold=JACCARD_THRESHOLD, against=corpus
        )
    )
    monkeypatch.setattr(dedup, "SINGLE_SORT_MAX_ROWS", 0)
    assert single and _rows(
        dedup.ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_df=5
        )
    ) == single
    assert single_delta and _rows(
        dedup.ngram_jaccard_pairs(
            new, threshold=JACCARD_THRESHOLD, max_df=5, against=corpus
        )
    ) == single_delta
    assert single_incr and _rows(
        dedup_cluster_incr(spark, sf_dir)
    ) == single_incr
    assert single_mh and _rows(
        dedup.minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)
    ) == single_mh
    assert single_mh_delta and _rows(
        dedup.minhash_lsh_pairs(
            new, threshold=JACCARD_THRESHOLD, against=corpus
        )
    ) == single_mh_delta


def test_arrays_param_contract_enforced(spark, sf_dir):
    """Round-14 (r13 ADVICE): arrays= must fail loudly on every path
    that would silently ignore it, and a CkArrays built with different
    shingling parameters must be refused."""
    from eea_crawler_spark.operators import dedup as DD
    from eea_crawler_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    new = docs.filter("doc_id % 2 = 0")
    corpus = docs.filter("doc_id % 2 = 1")
    arr = DD.ck_shingle_arrays(docs)
    # uncapped path ignores hashed arrays -> refuse
    with pytest.raises(ValueError, match="capped"):
        DD.ngram_jaccard_pairs(docs, threshold=0.8, arrays=arr)
    # delta path takes against_arrays, not arrays -> refuse
    with pytest.raises(ValueError, match="against_arrays"):
        DD.ngram_jaccard_pairs(
            new, threshold=0.8, max_df=5, against=corpus, arrays=arr
        )
    with pytest.raises(ValueError, match="against_arrays"):
        DD.minhash_lsh_pairs(new, threshold=0.8, against=corpus, arrays=arr)
    # mismatched shingling parameters -> refuse (n=4 relation, n=3 run)
    arr4 = DD.ck_shingle_arrays(docs, n=4)
    with pytest.raises(ValueError, match="shingling parameters"):
        DD.ngram_jaccard_pairs(docs, threshold=0.8, max_df=5, arrays=arr4)
    with pytest.raises(ValueError, match="shingling parameters"):
        DD.minhash_lsh_pairs(docs, threshold=0.8, arrays=arr4)
    # matched parameters pass through and agree with the direct run
    direct = DD.ngram_jaccard_pairs(
        docs, threshold=0.8, max_df=5
    ).collect()
    via = DD.ngram_jaccard_pairs(
        docs, threshold=0.8, max_df=5, arrays=arr
    ).collect()
    assert [tuple(r) for r in via] == [tuple(r) for r in direct]
