"""Physical-plan audits: the properties that matter at 100 TB.

Correctness tests prove the right rows come back; these pin *how*:
dimension joins must broadcast (no fact-side shuffle), filters must
reach the parquet scan (PushedFilters), projections must prune the
read schema, and aggregations must be partial (map-side combine)
before the exchange. A regression here is invisible at sf0.01 and
fatal at scale, which is exactly why it gets a test.
"""

from __future__ import annotations

import pytest

from eea_crawler_spark.plans import QUERIES
from eea_crawler_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize("name", ["q6", "q7", "q25"])
def test_dimension_joins_broadcast(spark, sf_dir, name):
    """nation/region/customer-side dim joins: fact side never shuffles."""
    plan = _plan(QUERIES[name](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere in these dim-join shapes
    assert "SortMergeJoin" not in plan


def test_filter_reaches_parquet_scan(spark, sf_dir):
    """Q2's predicate must be pushed into the scan, not post-filtered."""
    plan = _plan(QUERIES["q2"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderstatus)" in plan or "EqualTo(o_orderstatus" in plan


def test_projection_prunes_read_schema(spark, sf_dir):
    """Q1 selects 2 of region's columns — the scan must read only 2."""
    plan = _plan(QUERIES["q1"](spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "r_regionkey" in scan_line and "r_name" in scan_line
    assert "r_comment" not in scan_line  # untouched column never read


def test_aggregation_is_partial(spark, sf_dir):
    """Q13 (TPC-H Q1 shape): map-side combine before the exchange —
    two HashAggregate rounds, one shuffle of partial states."""
    plan = _plan(QUERIES["q13"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_lineitem_filter_pushdown_in_join_query(spark, sf_dir):
    """Q7 (5-way join): the region filter must reach region's scan so
    the join tree starts from the 1-row side, not post-filter."""
    opt = _optimized(QUERIES["q7"](spark, sf_dir))
    # optimized plan applies the literal filter directly above region's scan
    assert "ASIA" in opt
    plan = _plan(QUERIES["q7"](spark, sf_dir))
    assert "EqualTo(r_name,ASIA)" in plan  # inside the scan's PushedFilters


def test_whole_stage_codegen_everywhere(spark, sf_dir):
    """Scalar-function queries stay inside WholeStageCodegen (no
    Python row boundary in the hot path). Codegen spans appear as
    ``*(n)`` markers in the final adaptive plan, so execute first."""
    for name in ("q21", "q24", "q32"):
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # materialize the final AQE plan
        plan = _plan(df)
        assert "*(" in plan, name  # at least one codegen stage
        assert "BatchEvalPython" not in plan, name  # no row-at-a-time UDF
        assert "ArrowEvalPython" not in plan, name  # no pandas UDF either


def test_normalize_chain_is_one_stage(spark):
    """The §2.5 chain is pure per-row compute: its plan must contain
    zero Exchange (no shuffle from flatten to projection)."""
    from eea_crawler_spark.operators.normalize_chain import (
        DEFAULT_CONFIG,
        common_normalizer,
    )

    df = spark.createDataFrame(
        [
            (
                "u1", "Document", "eea", "https://site.example", 200,
                [], "2024-01-01", "2024-01-02", None, None,
                '{"title": "T"}',
            )
        ],
        "id string, doc_type string, site_id string, site string, "
        "status_code int, errors array<string>, modified string, "
        "indexed_at string, pdf_text string, web_html string, "
        "raw_value string",
    )
    plan = _plan(common_normalizer(df, DEFAULT_CONFIG))
    assert "Exchange" not in plan


def test_sync_diff_joins_on_id_without_fact_broadcast(spark, sf_dir):
    """The incremental diff join shuffles listing + state by id once;
    with a large state table a broadcast would OOM the driver, so the
    plan must hash-partition both sides, not broadcast the state."""
    from eea_crawler_spark.operators.incremental import sync_diff

    listing = (
        load_table(spark, sf_dir, "orders")
        .selectExpr("CAST(o_orderkey AS STRING) AS id", "CAST(o_orderdate AS STRING) AS modified")
    )
    state = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(o_orderkey AS STRING) AS id",
            "CAST(o_orderdate AS STRING) AS modified",
            "array() AS errors",
        )
    )
    # hint nothing: both sides same size — Spark must not pick BNLJ
    plan = _plan(sync_diff(listing, state))
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_capped_materializes_shingles_once(spark, sf_dir):
    """The capped Jaccard plan must read the documents scan ZERO times
    in its final DataFrame: every consumer (prefix index, hot valve,
    full-array rescore) reads the checkpointed shingle-array blocks
    instead of re-deriving the shingling (the round-2 4× regression)."""
    from eea_crawler_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    df = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id",
                             threshold=0.8, max_df=20)
    plan = _plan(df)
    assert "Scan parquet" not in plan  # no re-derivation from the file
    assert "ExistingRDD" in plan  # consumers read the checkpoint


def test_ngram_capped_rescore_is_broadcast_only(spark, sf_dir):
    """Shape pin (round 4, kept through the round-5 prefix-filter
    rewrite): the capped path's exact rescore must not run a second
    inverted-index pass. The one shuffle join (prefix self-join)
    happens before the survivor checkpoint, so the FINAL plan —
    survivors + full-array broadcast rescore — may contain only
    broadcast joins over the materialized shortlist."""
    from eea_crawler_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    df = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id",
                             threshold=0.8, max_df=20)
    plan = _plan(df)
    # correction joins are broadcast (or folded away entirely when the
    # corpus has no hot shingles) — never a shuffle join
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_minhash_lsh_caches_signatures_rescans_candidates_only(spark, sf_dir):
    """LSH materialization contract: the SIGNATURE table (one 64-long
    row per doc) is the cached relation feeding banding and the est
    join — the exploded shingle relation is never checkpointed (at 5M
    docs it is ~20x the input bytes deserialized and starved the
    signature aggregate's memory). The verify leg re-shingles the
    candidate docs (semi-join-pruned scan, checkpointed because
    _pair_jaccard consumes it three times), so the FINAL plan reads
    only checkpoints — no parquet re-scans."""
    from eea_crawler_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    df = minhash_lsh_pairs(docs, text_col="text", id_col="doc_id", threshold=0.8)
    plan = _plan(df)
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan  # sigs + cand + sh_cand checkpoints


def test_incremental_sync_normalize_is_semi_join_pruned(spark, sf_dir, tmp_path):
    """run_sync's normalize input: raw scan semi-joined on the run's
    changed ids BEFORE the chain — the plan shape that keeps a quick
    sync O(changed) at 100 TB. Audited on the same composition the
    pipeline builds (read → semi-join → error filter → chain)."""
    from eea_crawler_spark.operators.normalize_chain import (
        DEFAULT_CONFIG,
        common_normalizer,
    )
    from pyspark.sql import functions as F

    raw = spark.createDataFrame(
        [
            (
                "u1", "Document", "eea", "https://site.example", 200,
                [], "2024-01-01", None, None, None, '{"title": "T"}',
            )
        ],
        "id string, doc_type string, site_id string, site string, "
        "status_code int, errors array<string>, modified string, "
        "indexed_at timestamp, pdf_text string, web_html string, "
        "raw_value string",
    )
    path = str(tmp_path / "raw")
    raw.write.parquet(path)
    changed = spark.createDataFrame([("u1",)], "id string").localCheckpoint()
    raw_ok = (
        spark.read.parquet(path)
        .join(changed, "id", "left_semi")
        .filter(F.size("errors") == 0)
    )
    plan = _plan(common_normalizer(raw_ok, DEFAULT_CONFIG))
    assert "LeftSemi" in plan  # id pruning happens below the chain


def test_with_dedup_flags_join_broadcasts_sidecar(spark, tmp_path):
    """The flags sidecar join is the hot path every training-data read
    pays (round-10 verdict #5): at serving sizes the 3-column sidecar
    must arrive broadcast — the docs (fact) side never shuffles. The
    crossover past broadcast range (~10⁸–10⁹ flag rows) is documented
    on with_dedup_flags; we pin the CURRENT plan, not a forced
    broadcast hint, so the at-scale fallback stays available.
    """
    from pyspark.sql import functions as F

    from eea_crawler_spark.pipeline import DedupConfig, with_dedup_flags
    from eea_crawler_spark.sinks import indexes as SK

    docs = spark.range(2000).select(
        F.concat(F.lit("d"), F.col("id")).alias("id"),
        F.lit("body").alias("fulltext"),
    )
    flags = spark.range(500).select(
        F.concat(F.lit("d"), F.col("id")).alias("id"),
        F.concat(F.lit("d"), F.col("id") % 7).alias("cluster_id"),
        (F.col("id") % 7 == 0).alias("keep"),
        F.current_timestamp().alias("updated_at"),
    )
    dcfg = DedupConfig(
        state_path=str(tmp_path / "s"),
        clusters_path=str(tmp_path / "c"),
        flags_path=str(tmp_path / "flags"),
    )
    SK.upsert_index(
        spark, dcfg.flags_path, flags, key="id",
        order_col="updated_at", unique_keys=True,
    )
    out = with_dedup_flags(spark, docs, dcfg)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # and the defaulting logic holds: unflagged docs are singletons
    row = out.filter(F.col("id") == "d1500").first()
    assert row["cluster_id"] == "d1500" and row["keep"] is True


def test_ann_search_exclusion_join_broadcasts_ledger(spark, tmp_path):
    """The serve-time stale exclusion (round-11 verdict #4): a
    ledger-sized exclusion set must arrive BROADCAST into the probed
    lists' anti-join — the lists (fact) side never shuffles on the hot
    serve path. The operator deliberately takes no broadcast hint
    (similarity.ivf_topk_state): the ledger is bounded by the rebuild
    trigger fraction (default 5% of indexed rows), so past broadcast
    range (~10⁸ ledgered ids — an index overdue for rebuild by two
    orders of magnitude) Spark's size estimate falls back to a shuffle
    join, which is the correct plan there. We pin the CURRENT
    estimate-driven plan, keeping the at-scale fallback available.
    """
    import numpy as np

    from eea_crawler_spark.operators import similarity as SIM

    rng = np.random.RandomState(5)
    corpus = spark.createDataFrame(
        [
            (i, [float(x) for x in rng.standard_normal(8)])
            for i in range(300)
        ],
        "vec_id bigint, embedding array<float>",
    )
    path = str(tmp_path / "ivf")
    SIM.build_ivf_index(corpus, path, n_clusters=4, n_iter=1)
    # the real serve path reads the ledger from PARQUET (ann_search) —
    # file-size stats are what the no-hint estimate keys on
    spark.createDataFrame(
        [(i,) for i in range(40)], "vec_id bigint"
    ).write.parquet(str(tmp_path / "ledger"))
    excl = spark.read.parquet(str(tmp_path / "ledger"))
    out = SIM.ivf_topk_state(
        spark, path, corpus.limit(2), k=3, n_probe=2, exclude_ids=excl
    )
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
