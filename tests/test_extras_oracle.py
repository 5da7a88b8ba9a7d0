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
